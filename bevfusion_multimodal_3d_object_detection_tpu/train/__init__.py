from .loop import Trainer, TrainState, make_train_step, make_eval_step  # noqa: F401
