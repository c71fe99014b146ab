from zenslam_tpu.config.options import AllOptions, load_options, save_options
