from .torch_pickle import load_torch_checkpoint
