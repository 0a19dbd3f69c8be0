"""Library logging (the `log` crate usage in the reference, A5).

The reference logs device selection at info (`ec-gpu-proxy/src/fft.rs:
187-191`, `multiexp.rs:308-316`), kernel-init failures at error
(`fft.rs:175-179`), and dropped results at trace (`threadpool.rs:60-62`);
tests init `fil_logger` and CI sets RUST_LOG=debug.  Here: stdlib `logging`
under the ``tpu_ec`` namespace, level taken from the typed config
(TPU_EC_LOG env), with a null default handler so embedding applications
control output.
"""

from __future__ import annotations

import logging

_configured = False


def get_logger(name: str = "tpu_ec") -> logging.Logger:
    global _configured
    logger = logging.getLogger(name)
    if not _configured:
        root = logging.getLogger("tpu_ec")
        if not root.handlers:
            root.addHandler(logging.NullHandler())
        from ..config import get_config

        level = getattr(logging, get_config().log_level.upper(), logging.WARNING)
        root.setLevel(level)
        _configured = True
    return logger


def init_logging(level: str | int | None = None) -> None:
    """Opt-in console logging (the `fil_logger::init()` analog for tests and
    scripts): attaches a stream handler to the ``tpu_ec`` root logger."""
    root = logging.getLogger("tpu_ec")
    for h in list(root.handlers):
        if isinstance(h, logging.NullHandler):
            root.removeHandler(h)
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        root.addHandler(h)
    if level is None:
        from ..config import get_config

        level = get_config().log_level
    if isinstance(level, str):
        level = getattr(logging, level.upper(), logging.INFO)
    root.setLevel(level)
