"""Checkpoint inspection / manipulation — the CheckpointTool analog.

Reference parity: the reference ships a command-line tool that prints
the latest checkpoint of a job (the offset of every SystemStreamPartition)
and can overwrite checkpoints to force reprocessing
(samza-core/src/main/scala/org/apache/samza/checkpoint/CheckpointTool.scala;
exercised by TestCheckpointTool.scala). Operationally it covers two
needs: *audit* ("where is this job?") and *rewind* ("replay from here").

Spark-native translation: a Structured Streaming checkpoint directory IS
the checkpoint store — ``offsets/<batchId>`` files record each source's
end offset per micro-batch (line 1: version, line 2: batch metadata
JSON, lines 3+: one offset per source, ``-`` for none) and
``commits/<batchId>`` marks the batch durable. So:

* :func:`inspect` = CheckpointTool's print mode — latest planned batch,
  last committed batch, per-source offsets, and a flattened
  partition->offset view for dict-shaped offsets (the samza_log
  source's SSP ordinals).
* :func:`rewind_to` = the overwrite mode's main use: drop all planning
  state after batch N so the restarted query re-executes batch N from
  the recorded pre-N offsets and replays everything since. Replay is
  exact for replayable sources (files, samza_log) — same contract as
  the reference rewinding a Kafka offset.
* :func:`set_offsets` = the surgical overwrite: rewrite one source's
  end offset inside a planned-but-uncommitted batch (e.g. skip a poison
  record range) before restart.

All mutations happen with the query STOPPED, same as the reference tool
("When running this tool, you need to ... job" — it operates out-of-band
on the checkpoint stream).
"""

from __future__ import annotations

import json
import os


def _batch_files(ckpt_dir: str, sub: str) -> "dict[int, str]":
    d = os.path.join(ckpt_dir, sub)
    out = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if name.startswith(".") or name.endswith(".tmp") or name.endswith(".crc"):
            continue
        try:
            out[int(name)] = os.path.join(d, name)
        except ValueError:
            continue
    return out


def list_batches(ckpt_dir: str) -> dict:
    """Planned (offsets/) and committed (commits/) batch ids, sorted."""
    return {
        "offsets": sorted(_batch_files(ckpt_dir, "offsets")),
        "commits": sorted(_batch_files(ckpt_dir, "commits")),
    }


def _parse_offset(line: str):
    line = line.strip()
    if line in ("", "-"):
        return None
    try:
        return json.loads(line)
    except ValueError:
        return line


def read_offsets(ckpt_dir: str, batch_id: "int | None" = None) -> dict:
    """Parse one offsets file (latest if ``batch_id`` is None)."""
    files = _batch_files(ckpt_dir, "offsets")
    if not files:
        raise FileNotFoundError(f"no offsets files under {ckpt_dir}/offsets")
    if batch_id is None:
        batch_id = max(files)
    if batch_id not in files:
        raise FileNotFoundError(f"offsets/{batch_id} not found in {ckpt_dir}")
    with open(files[batch_id]) as f:
        lines = f.read().splitlines()
    meta = {}
    if len(lines) > 1:
        try:
            meta = json.loads(lines[1])
        except ValueError:
            meta = {"raw": lines[1]}
    return {
        "batch_id": batch_id,
        "version": lines[0] if lines else None,
        "metadata": meta,
        "sources": [_parse_offset(l) for l in lines[2:]],
    }


def inspect(ckpt_dir: str) -> dict:
    """The tool's print mode: where is this job?

    Returns latest planned batch + its per-source offsets, the last
    committed batch, whether the latest batch is still in-flight, and —
    for dict-shaped offsets like the samza_log source's
    ``{"partition": next_ordinal}`` — a flat ``ssp`` list of
    ``(source_index, partition, offset)`` rows, the same view the
    reference tool prints per SystemStreamPartition.
    """
    batches = list_batches(ckpt_dir)
    if not batches["offsets"]:
        return {"batches": batches, "latest": None, "committed": None,
                "in_flight": False, "ssp": []}
    latest = read_offsets(ckpt_dir)
    committed = max(batches["commits"]) if batches["commits"] else None
    ssp = []
    for i, off in enumerate(latest["sources"]):
        if isinstance(off, dict):
            for part, ordinal in sorted(off.items()):
                ssp.append({"source": i, "partition": part, "offset": ordinal})
        elif off is not None:
            ssp.append({"source": i, "partition": None, "offset": off})
    return {
        "batches": batches,
        "latest": latest,
        "committed": committed,
        "in_flight": committed is None or committed < latest["batch_id"],
        "ssp": ssp,
    }


def rewind_to(ckpt_dir: str, batch_id: int) -> dict:
    """Force the restarted query to re-execute batch ``batch_id`` and
    everything after it: delete ``offsets/*`` newer than the batch and
    ``commits/*`` at-or-newer. The batch's recorded END offsets stay, so
    the replayed range is exactly what the original run read.

    Returns the deleted file names. Query must be stopped."""
    offsets = _batch_files(ckpt_dir, "offsets")
    if batch_id not in offsets:
        raise ValueError(
            f"batch {batch_id} has no offsets file (have {sorted(offsets)})"
        )
    deleted = []
    for b, path in sorted(_batch_files(ckpt_dir, "offsets").items()):
        if b > batch_id:
            os.remove(path)
            deleted.append(f"offsets/{b}")
    for b, path in sorted(_batch_files(ckpt_dir, "commits").items()):
        if b >= batch_id:
            os.remove(path)
            deleted.append(f"commits/{b}")
    return {"rewound_to": batch_id, "deleted": deleted}


def set_offsets(ckpt_dir: str, batch_id: int, source_index: int, new_offset) -> dict:
    """Overwrite one source's end offset inside a planned batch (the
    reference tool's checkpoint-overwrite mode). Also un-commits the
    batch so the restart re-plans it against the edited offset."""
    off = read_offsets(ckpt_dir, batch_id)
    if source_index >= len(off["sources"]):
        raise IndexError(
            f"source {source_index} out of range ({len(off['sources'])} sources)"
        )
    files = _batch_files(ckpt_dir, "offsets")
    with open(files[batch_id]) as f:
        lines = f.read().splitlines()
    lines[2 + source_index] = (
        "-" if new_offset is None
        else json.dumps(new_offset, separators=(",", ":"))
        if not isinstance(new_offset, str) else new_offset
    )
    tmp = files[batch_id] + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines))
    os.replace(tmp, files[batch_id])
    removed = []
    for b, path in sorted(_batch_files(ckpt_dir, "commits").items()):
        if b >= batch_id:
            os.remove(path)
            removed.append(f"commits/{b}")
    return {"batch_id": batch_id, "source": source_index,
            "offset": new_offset, "uncommitted": removed}


def main(argv: "list[str] | None" = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="samza_spark.streaming.checkpoint_tool",
        description="Inspect / rewind a Structured Streaming checkpoint "
        "(CheckpointTool analog).",
    )
    p.add_argument("--checkpoint", required=True, help="checkpoint directory")
    p.add_argument("--rewind-to", type=int, default=None, metavar="BATCH",
                   help="re-execute from this batch on next start")
    args = p.parse_args(argv)
    if args.rewind_to is not None:
        print(json.dumps(rewind_to(args.checkpoint, args.rewind_to)))
    else:
        print(json.dumps(inspect(args.checkpoint), default=str))
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
