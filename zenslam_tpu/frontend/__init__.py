from zenslam_tpu.frontend.tables import (
    insert_into_free_slots,
    allocate_landmark_slots,
)
