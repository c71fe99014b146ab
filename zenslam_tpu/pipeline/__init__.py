from zenslam_tpu.pipeline.state import (
    SlamConfig,
    FeatureTable,
    LandmarkMap,
    MotionModel,
    SlamState,
    FrameTelemetry,
    init_state,
)
from zenslam_tpu.pipeline.step import slam_step, make_slam_step
from zenslam_tpu.pipeline.runner import run_sequence
