from .fpn import FPN, PAFPN, ChannelMapper

__all__ = ["FPN", "PAFPN", "ChannelMapper"]
