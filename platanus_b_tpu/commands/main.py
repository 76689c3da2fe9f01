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

    from . import assemble_cmd
    assemble_cmd.add_parser(sub)
    try:
        from . import scaffold_cmd
        scaffold_cmd.add_parser(sub)
    except ImportError:
        pass
    try:
        from . import solve_dbg_cmd
        solve_dbg_cmd.add_parser(sub)
    except ImportError:
        pass
    try:
        from . import gap_close_cmd
        gap_close_cmd.add_parser(sub)
    except ImportError:
        pass
    try:
        from . import polish_cmd
        polish_cmd.add_parser(sub)
    except ImportError:
        pass
    try:
        from . import merge_cmd
        merge_cmd.add_parser(sub)
    except ImportError:
        pass
    try:
        from . import kmer_divide_cmd
        kmer_divide_cmd.add_parser(sub)
    except ImportError:
        pass
    try:
        from . import iterate_cmd
        iterate_cmd.add_parser(sub)
    except ImportError:
        pass
    try:
        from . import orchestrators
        orchestrators.add_parsers(sub)
    except ImportError:
        pass
    try:
        from . import combine_cmd
        combine_cmd.add_parser(sub)
    except ImportError:
        pass
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
