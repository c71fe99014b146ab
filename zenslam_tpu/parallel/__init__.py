from zenslam_tpu.parallel.dist_ba import (
    shard_ba_problem,
    dist_bundle_adjust,
    make_ba_mesh,
)
