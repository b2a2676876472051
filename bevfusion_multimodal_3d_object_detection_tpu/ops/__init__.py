from .targets import prepare_centernet_targets, gaussian_radius  # noqa: F401
from .decode import decode_centernet_predictions, decode_to_host  # noqa: F401
from .losses import centernet_loss, detection_loss, prepare_mlp_targets  # noqa: F401
