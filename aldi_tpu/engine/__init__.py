from .train_step import TrainState, create_train_state, make_train_step  # noqa: F401
from .ema import ema_update  # noqa: F401
from .export import export_inference, load_artifact, save_artifact  # noqa: F401
