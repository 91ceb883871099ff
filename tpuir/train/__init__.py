from . import losses, schedulers
from .trainer import TrainState, make_train_step, build_optimizer

# populate the registries
from . import archs, metrics, data, model  # noqa: F401,E402
from . import video_datasets  # noqa: F401,E402
