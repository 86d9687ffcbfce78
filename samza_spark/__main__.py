"""``python -m samza_spark`` — subcommand launcher over the engine's
CLIs (the bin/ script family of the reference: run-app.sh, the SQL
shell, the checkpoint tool, the status reader)."""

from __future__ import annotations

import sys

_SUBCOMMANDS = {
    "run-app": ("samza_spark.run_app", "run a job from a .properties config"),
    "status": ("samza_spark.status", "job status registry (jobs/job/stop/tasks)"),
    "checkpoint-tool": (
        "samza_spark.streaming.checkpoint_tool",
        "inspect / rewind / edit a streaming checkpoint",
    ),
    "sql-shell": ("samza_spark.sql.shell", "interactive SQL shell"),
}


def main(argv: "list[str] | None" = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m samza_spark <command> [args]\n\ncommands:")
        for name, (_, desc) in _SUBCOMMANDS.items():
            print(f"  {name:17s} {desc}")
        return 0 if argv else 2
    name, rest = argv[0], argv[1:]
    target = _SUBCOMMANDS.get(name)
    if target is None:
        print(f"unknown command {name!r} (try --help)", file=sys.stderr)
        return 2
    import importlib

    mod = importlib.import_module(target[0])
    entry = getattr(mod, "main", None) or getattr(mod, "repl_main")
    return int(entry(rest) or 0)


if __name__ == "__main__":
    sys.exit(main())
