"""Idempotent foreachBatch sinks: effectively-once writes to stores that
are not transactional.

Samza is at-least-once (README "Durability"); replayed envelopes after a
crash re-execute side effects. Spark's foreachBatch re-runs a batch with
the SAME epoch_id after recovery, which makes exactly-once possible for
any sink if the writer skips epochs it has already committed. This helper
records committed epoch ids under a marker directory (one empty file per
epoch, rename-free so it works on object stores) and skips replays.
"""

from __future__ import annotations

import os
from typing import Callable


def idempotent_foreach_batch(
    fn: Callable, marker_dir: str
) -> Callable:
    """Wrap a foreachBatch function so each epoch commits at most once.

    ``fn(batch_df, epoch_id)`` runs only if ``marker_dir`` has no marker
    for ``epoch_id``; the marker is written AFTER fn returns, so a crash
    mid-write replays the batch (at-least-once within the batch, exactly
    once across completed batches — the same contract as Spark's own file
    sinks)."""
    os.makedirs(marker_dir, exist_ok=True)

    def wrapped(batch_df, epoch_id: int) -> None:
        marker = os.path.join(marker_dir, f"epoch-{epoch_id}.done")
        if os.path.exists(marker):
            return
        fn(batch_df, epoch_id)
        with open(marker, "w") as fh:
            fh.write("1")

    return wrapped
