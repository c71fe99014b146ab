from zenslam_tpu.imu.preintegration import (
    ImuIntegral,
    ImuNoise,
    preintegrate,
)
from zenslam_tpu.imu.continuous import (
    preintegrate_continuous,
    overlap_window_mask,
    interp_masked,
    gp_posterior_mean,
)
from zenslam_tpu.imu.predictors import (
    inertial_predict_pose,
    propagate_velocity,
)
from zenslam_tpu.imu.gravity import (
    GravityEstimator,
    gravity_init,
    gravity_add_sample,
    gravity_estimate,
)
