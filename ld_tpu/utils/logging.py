"""Root logger (file + stream). Parity: /root/reference/mmdet/utils/logger.py."""
from __future__ import annotations

import logging
from typing import Optional

_initialized = set()


def get_root_logger(log_file: Optional[str] = None,
                    log_level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger('ld_tpu')
    if 'ld_tpu' in _initialized:
        return logger
    logger.setLevel(log_level)
    fmt = logging.Formatter('%(asctime)s - %(name)s - %(levelname)s - '
                            '%(message)s')
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _initialized.add('ld_tpu')
    return logger
