"""Timestamped logger (OC_LOG / plgdInfo equivalents, ontcns_aux.h:19-35)."""

import logging
import sys

logger = logging.getLogger("necat_tpu")
if not logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("%(asctime)s [%(levelname)s] %(message)s",
                                     datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(h)
    logger.setLevel(logging.INFO)
