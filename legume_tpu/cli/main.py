"""Unified CLI: `python -m legume_tpu <binary> <subcommand> ...`.

Mirrors the reference's 8 installed binaries (`Makefile:1`):
senna, pinto, cocoa, faba, chickpea, data-beans, data-beans-sim,
fagioli — each a subcommand tree (`senna/src/main.rs:140-186` etc.).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

if os.environ.get("LEGUME_CPU") == "1":
    # pin JAX to host CPU before any jax import triggers accelerator
    # discovery (overrides site-injected platform lists)
    import jax

    jax.config.update("jax_platforms", "cpu")


def _lazy(mod, fn):
    def call(argv):
        import importlib

        return getattr(importlib.import_module(f"legume_tpu.cli.{mod}"), fn)(argv)

    return call


BINARIES = {
    "senna": _lazy("senna_cli", "run_senna"),
    "data-beans-sim": _lazy("sim_cli", "run_sim"),
    "data-beans": _lazy("beans_cli", "run_beans"),
    "cocoa": _lazy("cocoa_cli", "run_cocoa"),
    "pinto": _lazy("pinto_cli", "run_pinto"),
    "fagioli": _lazy("fagioli_cli", "run_fagioli"),
    "faba": _lazy("faba_cli", "run_faba"),
    "chickpea": _lazy("chickpea_cli", "run_chickpea"),
}


# direct handler aliases (tests and library callers invoke these)
def run_senna(argv):
    return BINARIES["senna"](argv)


def run_sim(argv):
    return BINARIES["data-beans-sim"](argv)


def run_beans(argv):
    return BINARIES["data-beans"](argv)


def run_cocoa(argv):
    return BINARIES["cocoa"](argv)


def run_pinto(argv):
    return BINARIES["pinto"](argv)


def run_fagioli(argv):
    return BINARIES["fagioli"](argv)


def run_faba(argv):
    return BINARIES["faba"](argv)


def run_chickpea(argv):
    return BINARIES["chickpea"](argv)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    # CLI runs render stage progress (library callers stay silent)
    os.environ.setdefault("LEGUME_PROGRESS", "1")
    logging.basicConfig(level=logging.INFO, format="[%(levelname)s %(name)s] %(message)s")
    from ..utils.stop import install_sigint_handler

    install_sigint_handler()
    from ..utils.progress import install_log_bridge

    install_log_bridge()
    from ..utils.jax_cache import ensure_compile_cache

    ensure_compile_cache()
    # multi-host: LEGUME_COORDINATOR/LEGUME_NUM_PROCESSES/LEGUME_PROCESS_ID
    # (or LEGUME_DISTRIBUTED=1 on pods with runtime discovery) turn on
    # jax.distributed before any backend touch (parallel/multihost.py)
    from ..parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    if not argv or argv[0] not in BINARIES:
        print(f"usage: legume <binary> ...; binaries: {', '.join(sorted(BINARIES))}")
        return 1
    try:
        BINARIES[argv[0]](argv[1:])
    except FileNotFoundError as e:
        # a missing input is a usage error, not a crash: clean one-line
        # message instead of a traceback (reference binaries print
        # `Error: ...` through anyhow and exit non-zero)
        path = e.filename if getattr(e, "filename", None) else str(e)
        print(f"error: file not found: {path}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
