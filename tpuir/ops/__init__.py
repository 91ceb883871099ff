from .pixel_shuffle import pixel_shuffle, pixel_unshuffle
