"""Heartbeat protocol for the retryOnError supervisor's hang detection.

Children (training loop, inference sweep) touch ``$MPGAN_HEARTBEAT`` at
every unit of forward progress; the jax-free supervising parent
(scripts/multipass_gan.py ``_run_child_watched``) kills a child whose
heartbeat goes stale past ``hangTimeout`` (SURVEY.md §5 failure detection —
the axon tunnel's observed failure mode is a silent hang, not a crash).
This module is the single definition of the touch side so the liveness
contract can't drift between the train and inference paths.
"""

from __future__ import annotations

import os


def touch_heartbeat() -> None:
    """Touch ``$MPGAN_HEARTBEAT`` if set; no-op (and never raises) otherwise."""
    hb = os.environ.get("MPGAN_HEARTBEAT")
    if not hb:
        return
    try:
        os.utime(hb)
    except OSError:
        try:
            with open(hb, "w"):
                pass
        except OSError:
            pass
