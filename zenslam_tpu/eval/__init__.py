from zenslam_tpu.eval.metrics import ate_rmse, rpe_rmse, align_umeyama
