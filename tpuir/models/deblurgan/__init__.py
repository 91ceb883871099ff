from .fpn_mobilenet import FPNMobileNet, convert_state_dict as convert_mobilenet
from .fpn_inception import FPNInception, convert_state_dict as convert_inception
