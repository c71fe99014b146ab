from zenslam_tpu.ops.image import (
    gaussian_blur,
    build_pyramid,
    bilinear_sample,
    remap,
    clahe,
    scharr_gradients,
    rgb_to_gray,
)
from zenslam_tpu.ops.fast import fast_score, detect_grid_keypoints
from zenslam_tpu.ops.harris import harris_score, harris_score_multiscale
from zenslam_tpu.ops.dog import dog_score
from zenslam_tpu.ops.orb import orb_orientation, orb_descriptors, ORB_PATTERN
from zenslam_tpu.ops.sift import sift_descriptors
from zenslam_tpu.ops.freak import freak_descriptors
from zenslam_tpu.ops.match import (
    hamming_matrix,
    match_descriptors,
    unpack_bits,
)
from zenslam_tpu.ops.lk import pyramidal_lk
