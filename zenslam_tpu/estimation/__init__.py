from zenslam_tpu.estimation.ransac import ransac_sample_indices
from zenslam_tpu.estimation.pnp import solve_pnp_ransac, refine_pnp_gn, pnp_dlt
from zenslam_tpu.estimation.rigid import umeyama, solve_rigid_ransac
from zenslam_tpu.estimation.epipolar import (
    fundamental_8pt,
    essential_8pt,
    solve_fundamental_ransac,
    solve_essential_ransac,
    recover_pose_from_essential,
    estimate_2d2d_scaled,
)
from zenslam_tpu.estimation.cascade import estimate_pose_cascade, PoseEstimate
from zenslam_tpu.estimation.fusion import fuse_poses, PoseCandidate
