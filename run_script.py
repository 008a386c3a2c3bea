"""Launcher for scripts/ entries: ``python run_script.py <name> [args...]``.

Running ``python scripts/foo.py`` puts ``scripts/`` (not the repo root) on
``sys.path``, so ``import adaptive_classifier_tpu`` fails; exporting
``PYTHONPATH=/root/repo`` instead breaks the axon TPU plugin (the env var
propagates into the plugin's helper process, where a repo directory shadows
one of its imports and the backend fails to register).  Running THIS file
from the repo root sets ``sys.path[0]`` to the repo root in-process only —
both imports and the TPU plugin work.
"""

import runpy
import sys
from pathlib import Path

# persistent XLA compile cache: tunnel-TPU compiles are slow (~20-40 s);
# the cache makes repeat script runs start in seconds (same setup bench.py
# uses).  Must be configured before the first jax computation.
try:
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # AC_FORCE_CPU=1: run the script on host CPU even when the TPU plugin is
    # present (the plugin overrides the JAX_PLATFORMS env var, so this must
    # be an in-process config update).  Lets CPU-safe script work proceed
    # while a long TPU job (e.g. pretraining) owns the single tunneled chip.
    if os.environ.get("AC_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

if len(sys.argv) < 2:
    names = sorted(p.stem for p in (Path(__file__).parent / "scripts").glob("*.py"))
    sys.exit("usage: python run_script.py <script> [args...]\nscripts: " + ", ".join(names))

script = Path(__file__).parent / "scripts" / f"{sys.argv[1]}.py"
if not script.exists():
    sys.exit(f"no such script: {script}")
sys.argv = [str(script)] + sys.argv[2:]
runpy.run_path(str(script), run_name="__main__")
