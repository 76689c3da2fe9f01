"""CLI entry point: subcommand dispatch (main.cpp:80-104 equivalent).

Usage: python -m platanus_b_tpu <command> [options]
"""

from __future__ import annotations

import argparse
import sys

from .. import __version__, REFERENCE_VERSION
from ..utils.errors import PlatanusError
from ..utils.log import LOG


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="platanus_b_tpu",
        description=(f"platanus_b_tpu v{__version__} — TPU-native assembler "
                     f"with Platanus_B v{REFERENCE_VERSION} capabilities"))
    sub = parser.add_subparsers(dest="command", required=True)

    # unconditional imports: a broken subcommand module must fail loudly,
    # not silently vanish from the CLI
    from . import (assemble_cmd, combine_cmd, gap_close_cmd, iterate_cmd,
                   kmer_divide_cmd, merge_cmd, orchestrators, polish_cmd,
                   scaffold_cmd, solve_dbg_cmd)
    assemble_cmd.add_parser(sub)
    scaffold_cmd.add_parser(sub)
    solve_dbg_cmd.add_parser(sub)
    gap_close_cmd.add_parser(sub)
    polish_cmd.add_parser(sub)
    merge_cmd.add_parser(sub)
    kmer_divide_cmd.add_parser(sub)
    iterate_cmd.add_parser(sub)
    orchestrators.add_parsers(sub)
    combine_cmd.add_parser(sub)
    return parser


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across runs (first compile is ~20-40s on
    TPU; assembly reuses a bounded set of capacity-bucketed shapes)."""
    import jax

    try:
        # CPU AOT entries are machine-feature specific and must not share
        # a dir with the TPU cache (cpu_aot_loader feature-mismatch noise)
        backend = jax.default_backend()
        cache = ("/tmp/platanus_b_tpu_jax_cache" if backend != "cpu"
                 else "/tmp/platanus_b_tpu_jax_cache_cpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # PLATANUS_B_TPU_PLATFORM=cpu forces the JAX backend (hosts without an
    # accelerator, CI) — must run before first backend use
    import os
    platform = os.environ.get("PLATANUS_B_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    # multi-process bring-up (JAX_COORDINATOR_ADDRESS & friends) must run
    # before any backend use; logs whether multi-host mode is active
    from ..parallel import multihost as mh
    if mh.initialize():
        LOG.info(f"multi-host runtime: process {mh.process_index()} "
                 f"of {mh.process_count()}")
    _enable_compilation_cache()
    LOG.info(f"platanus_b_tpu version {__version__} "
             f"(Platanus_B {REFERENCE_VERSION} capabilities)")
    LOG.info("Command: " + " ".join(argv))
    parser = build_parser()
    from .libparse import extract_library_args
    try:
        argv, libspecs = extract_library_args(argv)
    except PlatanusError as e:
        LOG.info(f"ERROR({e.exit_id}): {e.message}")
        return e.exit_id
    args = parser.parse_args(argv)
    args.libspecs = libspecs
    try:
        with LOG.profile(os.environ.get("PLATANUS_B_TPU_PROFILE")):
            rc = args.func(args)
    except PlatanusError as e:
        # typed exit codes like main.cpp:118-127
        LOG.info(f"ERROR({e.exit_id}): {e.message}")
        return e.exit_id
    except OSError as e:
        LOG.info(f"ERROR(2): {e}")
        return 2
    return rc or 0


if __name__ == "__main__":
    raise SystemExit(main())
