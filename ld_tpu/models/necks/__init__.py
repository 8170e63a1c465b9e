from .fpn import FPN, ChannelMapper

__all__ = ['FPN', 'ChannelMapper']
