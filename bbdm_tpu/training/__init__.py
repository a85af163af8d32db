"""Training engine: functional train state, EMA, plateau LR, jitted steps."""

from bbdm_tpu.training.state import TrainState  # noqa: F401
from bbdm_tpu.training.plateau import PlateauState, plateau_init, plateau_step  # noqa: F401
from bbdm_tpu.training.optim import build_optimizer  # noqa: F401
from bbdm_tpu.training.step import make_train_step, make_eval_step  # noqa: F401
