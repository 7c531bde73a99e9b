"""CLI entry: python -m ngsepcore_tpu <Command> [options] <args>

Ref: src/ngsep/main/NGSEPcore.java:35-67 — command dispatch by id with
legacy-id redirect and a grouped help listing.
"""
from __future__ import annotations

import sys


def print_help() -> None:
    from . import __version__
    from .cli import commands  # noqa: F401 (registers commands)
    from .cli.registry import all_commands

    print(f"ngsepcore_tpu {__version__} — TPU-native NGS analysis framework")
    print("Usage: python -m ngsepcore_tpu <Command> [options] <args>\n")
    groups: dict[str, list] = {}
    for c in all_commands():
        if not c.hidden:
            groups.setdefault(c.group, []).append(c)
    for g in ("Reads", "Discovery", "Genomes", "VariantsDownstream", "Benchmark"):
        cmds = groups.get(g, [])
        if not cmds:
            continue
        print(f"[{g}]")
        for c in sorted(cmds, key=lambda c: c.id):
            print(f"  {c.id:<36} {c.description}")
        print()


def _ensure_backend() -> None:
    """Fall back to CPU (loudly) if the configured accelerator backend
    failed to register — e.g. the TPU tunnel was briefly held by another
    process at interpreter start."""
    import jax

    try:
        jax.devices()
    except RuntimeError as e:
        print(
            f"WARNING: accelerator backend unavailable ({e}); falling back to CPU",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
        jax.devices()


def _log_parameters(cmd, opts: dict, pos: list[str]) -> None:
    """Log the full effective parameter set at command start (ref:
    every engine's logParameters, e.g. ReadsAligner.java:345-366)."""
    lines = [f"Running {cmd.id}"]
    for o in cmd.options:
        if o.attr in opts:
            lines.append(f"  -{o.flag} ({o.attr}): {opts[o.attr]}")
    if pos:
        lines.append(f"  positional: {' '.join(pos)}")
    print("\n".join(lines), file=sys.stderr, flush=True)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # global flags (any position): --profile dumps the per-stage
    # wall-clock ledger at exit (utils/profiling.py)
    profile = False
    while "--profile" in argv:
        argv.remove("--profile")
        profile = True
    if not argv or argv[0] in ("-h", "--help", "help"):
        print_help()
        return 0
    if profile:
        from .utils import profiling

        profiling.enable()
    _ensure_backend()
    from .cli import commands  # noqa: F401
    from .cli.registry import get_command, parse_args

    cmd = get_command(argv[0])
    if cmd is None:
        print(f"Unknown command: {argv[0]}\n", file=sys.stderr)
        print_help()
        return 1
    opts, pos = parse_args(cmd, argv[1:])
    # fill defaults for typed options
    for o in cmd.options:
        if o.attr not in opts and o.default is not None:
            opts[o.attr] = o.default
    _log_parameters(cmd, opts, pos)
    try:
        cmd.runner(opts, pos)
    finally:
        if profile:
            from .utils import profiling

            profiling.report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
