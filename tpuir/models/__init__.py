from . import dncnn, rednet
