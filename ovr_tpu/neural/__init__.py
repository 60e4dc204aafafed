from ovr_tpu.neural.field import NeuralFieldVolume, field_sample, init_field, sample_any_volume
from ovr_tpu.neural.hashgrid import HashGridConfig, encode, init_hashgrid
from ovr_tpu.neural.losses import l1, l2, relative_l2
from ovr_tpu.neural.train import bake_grid, fit_to_grid, make_image_train_step
