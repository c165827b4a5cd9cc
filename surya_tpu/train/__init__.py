from surya_tpu.train.steps import TrainState, make_train_step, make_eval_step, create_train_state  # noqa: F401
from surya_tpu.train.loop import train_and_evaluate  # noqa: F401
