"""Leveled logging with a pluggable callback.

Equivalent of ``whisper_log_set`` + ``whisper_log_internal``
(/root/reference/thirdparty/whisper.cpp/whisper.h:619,
whisper.cpp:6601-6629) and the Godot bridge that routes engine logs into
ERR/WARN/print (/root/reference/src/register_types.cpp:34-49).
"""

from __future__ import annotations

import enum
import sys
from typing import Callable, Optional


class LogLevel(enum.IntEnum):
    # mirrors ggml_log_level
    ERROR = 2
    WARN = 3
    INFO = 4
    DEBUG = 5


_callback: Optional[Callable[[LogLevel, str], None]] = None


def default_log_callback(level: LogLevel, text: str) -> None:
    stream = sys.stderr if level <= LogLevel.WARN else sys.stdout
    stream.write(text)


def log_set(callback: Optional[Callable[[LogLevel, str], None]]) -> None:
    """Install a log callback; None restores the default (stderr/stdout)."""
    global _callback
    _callback = callback


def log(level: LogLevel, fmt: str, *args) -> None:
    text = (fmt % args) if args else fmt
    if not text.endswith("\n"):
        text += "\n"
    cb = _callback or default_log_callback
    cb(level, text)


def log_error(fmt: str, *args) -> None:
    log(LogLevel.ERROR, fmt, *args)


def log_warn(fmt: str, *args) -> None:
    log(LogLevel.WARN, fmt, *args)


def log_info(fmt: str, *args) -> None:
    log(LogLevel.INFO, fmt, *args)


def log_debug(fmt: str, *args) -> None:
    log(LogLevel.DEBUG, fmt, *args)


def system_info() -> str:
    """Capability string (whisper_print_system_info, whisper.cpp:3850-3873)
    — TPU edition."""
    import jax

    try:
        devs = jax.devices()
        dev_desc = f"{len(devs)}x {devs[0].device_kind}" if devs else "none"
        platform = devs[0].platform if devs else "none"
    except Exception:
        dev_desc, platform = "unavailable", "none"

    from ..ops.attention import use_pallas

    return (f"godot_whisper_tpu: jax = {jax.__version__} | "
            f"platform = {platform} | devices = {dev_desc} | "
            f"pallas = {int(use_pallas())} | "
            f"backend = XLA")
