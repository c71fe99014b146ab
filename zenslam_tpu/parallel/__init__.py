from zenslam_tpu.parallel.dist_ba import (
    shard_ba_problem,
    dist_bundle_adjust,
    make_ba_mesh,
)
from zenslam_tpu.parallel.multihost import (
    init_multihost,
    global_ba_mesh,
    distribute_ba_problem,
    gather_landmarks,
)
from zenslam_tpu.parallel.offline import (
    run_offline_chunks,
    run_offline_multiprocess,
    split_chunks,
    stitch_chunks,
)
