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

if len(sys.argv) < 2:
    names = sorted(p.stem for p in (Path(__file__).parent / "scripts").glob("*.py"))
    sys.exit("usage: python run_script.py <script> [args...]\nscripts: " + ", ".join(names))

script = Path(__file__).parent / "scripts" / f"{sys.argv[1]}.py"
if not script.exists():
    sys.exit(f"no such script: {script}")
sys.argv = [str(script)] + sys.argv[2:]
runpy.run_path(str(script), run_name="__main__")
