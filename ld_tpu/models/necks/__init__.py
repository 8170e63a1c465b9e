from .fpn import FPN, PAFPN, ChannelMapper
from .extra_necks import (BFP, CARAFE, FPN_CARAFE, HRFPN, NASFPN,
                          NASFCOS_FPN, FPG, RFP)

__all__ = ["FPN", "PAFPN", "ChannelMapper", "BFP", "CARAFE", "FPN_CARAFE",
           "HRFPN", "NASFPN", "NASFCOS_FPN", "FPG", "RFP"]
