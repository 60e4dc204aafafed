from ovr_tpu.render import accel, camera, integrator
