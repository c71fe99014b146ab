from zenslam_tpu.backend.ba import (
    BAProblem,
    bundle_adjust,
    bundle_adjust_cg,
    ba_cost,
    make_ba_problem,
)
from zenslam_tpu.backend.pose_graph import optimize_pose_graph, PoseGraph
from zenslam_tpu.backend.keyframes import KeyframeDB, kf_db_init, kf_db_add, covisibility
from zenslam_tpu.backend.bow import (
    Vocabulary,
    build_vocabulary,
    build_vocabulary_tree,
    descriptors_to_bow,
    save_vocabulary,
    load_vocabulary,
    BowDatabase,
    bow_db_init,
    bow_db_add,
    bow_db_query,
)
