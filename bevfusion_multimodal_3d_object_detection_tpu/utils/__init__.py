from .metrics import (  # noqa: F401
    compute_metrics,
    calculate_ap,
    match_predictions_to_gt,
    compute_center_distance_matrix,
    save_and_print_metrics,
)
