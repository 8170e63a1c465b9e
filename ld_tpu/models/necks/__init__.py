from .fpn import FPN, PAFPN, ChannelMapper
from .extra_necks import BFP, CARAFE, FPN_CARAFE, HRFPN, NASFPN

__all__ = ["FPN", "PAFPN", "ChannelMapper", "BFP", "CARAFE", "FPN_CARAFE",
           "HRFPN", "NASFPN"]
