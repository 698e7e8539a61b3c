"""Process-aware logging (reference: sat/helpers.py:127-147).

In JAX's single-controller-per-host SPMD model there is one Python process
per host; "rank 0" translates to `jax.process_index() == 0`.
"""

from __future__ import annotations

import logging
import sys

_LOGGER = None


def get_logger() -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("scail_tpu")
        if not logger.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(
                logging.Formatter("[%(asctime)s scail_tpu %(levelname)s] %(message)s")
            )
            logger.addHandler(h)
            logger.setLevel(logging.INFO)
        _LOGGER = logger
    return _LOGGER


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def print_rank0(msg: str, level: str = "info"):
    if is_main_process():
        getattr(get_logger(), level)(msg)


def print_all(msg: str, level: str = "info"):
    try:
        import jax

        prefix = f"[proc {jax.process_index()}] "
    except Exception:
        prefix = ""
    getattr(get_logger(), level)(prefix + msg)
