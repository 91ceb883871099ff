from . import losses, schedulers
from .trainer import TrainState, make_train_step, build_optimizer
