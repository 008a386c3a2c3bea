"""Repair encoder checkpoints written by the pre-fix to_hf_state_dict.

Before the ascontiguousarray fix (pretrain.py to_hf_state_dict), safetensors
silently serialized the UNDERLYING BUFFER of each transposed weight view with
the transposed shape metadata: a tensor saved as ``W.T`` (shape [out, in])
actually holds W's row-major bytes.  Loading therefore produced W.T.T-bytes
= the transpose of the intended matrix for the six per-layer matmul weights
(query/key/value/attention-output/ffn-in/ffn-out); embeddings, biases, and
LayerNorms were contiguous and are correct.

Recovery is exact: for an affected tensor Y with shape [out, in], the true
buffer is W (shape [in, out], same bytes), and the intended HF tensor is
W.T — i.e. ``Y.reshape(in, out).T``.  This script applies that in place and
stamps ``ac_transpose_repaired: true`` in config.json so a repaired
checkpoint is never repaired twice.

Usage:
    python scripts/repair_transposed_checkpoint.py checkpoints/ac-tiny [...]
"""

import json
import sys
from pathlib import Path

import numpy as np

AFFECTED_SUFFIXES = (
    "attention.self.query.weight", "attention.self.key.weight",
    "attention.self.value.weight", "attention.output.dense.weight",
    "intermediate.dense.weight", "output.dense.weight",
)


def repair(ckpt_dir: Path) -> bool:
    from safetensors.numpy import load_file, save_file

    cfg_path = ckpt_dir / "config.json"
    st_path = ckpt_dir / "model.safetensors"
    if not cfg_path.exists() or not st_path.exists():
        print(f"skip {ckpt_dir}: not an HF checkpoint dir")
        return False
    cfg = json.loads(cfg_path.read_text())
    if cfg.get("ac_transpose_repaired"):
        print(f"skip {ckpt_dir}: already repaired")
        return False
    if "ac_tiny_step" not in cfg:
        print(f"skip {ckpt_dir}: not written by our exporter")
        return False

    tensors = dict(load_file(str(st_path)))
    n = 0
    for name, arr in tensors.items():
        if name.endswith(AFFECTED_SUFFIXES) and arr.ndim == 2:
            out_d, in_d = arr.shape
            tensors[name] = np.ascontiguousarray(
                arr.reshape(in_d, out_d).T)
            n += 1
    save_file(tensors, str(st_path))
    cfg["ac_transpose_repaired"] = True
    cfg_path.write_text(json.dumps(cfg, indent=2))
    print(f"repaired {ckpt_dir}: {n} tensors")
    return True


def main():
    targets = sys.argv[1:] or ["checkpoints/ac-tiny", "checkpoints/ac-small"]
    repo = Path(__file__).resolve().parent.parent
    for t in targets:
        p = Path(t)
        if not p.exists():
            p = repo / t
        repair(p)


if __name__ == "__main__":
    main()
