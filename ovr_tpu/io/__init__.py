from ovr_tpu.io.colormaps import available_colormaps, create_colormap
from ovr_tpu.io.image import load_exr, save_exr, save_image
from ovr_tpu.io.raw import load_raw_volume
from ovr_tpu.io.tfn import TransferFunctionData, load_tfn_file, load_tfn_json, save_tfn_json
from ovr_tpu.io.vidi3d import create_scene
