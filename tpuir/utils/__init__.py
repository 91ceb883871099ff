from .natsort import natsorted, natural_key
from .misc import param_count, tree_size_bytes
