"""Pretrain a first-party encoder checkpoint ("ac-tiny") on offline real text.

No network, no downloaded weights: the corpus is real English harvested from
documentation installed on the machine (site-packages *.md/*.rst/*.txt prose
plus Python docstrings), the WordPiece vocab is trained here, and the
encoder pretrains with adaptive_classifier_tpu.pretrain's jitted MLM step on
the TPU.  Output is a standard HF-layout checkpoint directory that both
``Encoder(path)`` and ``transformers.BertModel.from_pretrained`` load.

Usage:
    python scripts/pretrain_encoder.py --out checkpoints/ac-tiny \
        --steps 60000 --batch 256 --seq 128
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import re
import sys
import time
import unicodedata
from pathlib import Path

import numpy as np

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------

_WORDISH = re.compile(r"[A-Za-z][a-z]+")
_CODE_HINTS = re.compile(r"[{}<>=_`|\\]|::|def |import |self\.|https?://")
_HTML_TAG = re.compile(r"<[^>]+>")
_PY_COMMENT = re.compile(r"#\s?(.*)")
_C_COMMENT = re.compile(r"//\s?(.*)")
_C_BLOCK = re.compile(r"/\*.*?\*/", re.S)
_C_BLOCK_STAR = re.compile(r"^\s*\*+\s?", re.M)
_ALPHA_RUN = re.compile(r"[A-Za-z]{2,}")
_DIGITS = re.compile(r"\d+")
_WS_RUN = re.compile(r"\s+")


def _prose_lines(text: str, min_len: int = 25, min_words: int = 4):
    """Keep natural-language lines, drop code/tables/markup."""
    for raw in text.splitlines():
        line = raw.strip()
        if len(line) < min_len or len(line) > 600:
            continue
        words = _WORDISH.findall(line)
        if len(words) < min_words:
            continue
        # prose = mostly lowercase words, few code-ish characters
        if len(_CODE_HINTS.findall(line)) > 2:
            continue
        alpha = sum(len(w) for w in words)
        if alpha / max(len(line), 1) < 0.55:
            continue
        yield line


def _docstring_lines(text: str):
    try:
        tree = ast.parse(text)
    except Exception:
        return
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            ds = ast.get_docstring(node)
            if ds:
                yield from _prose_lines(ds)


def _comment_lines(text: str, pattern):
    """English prose living in source comments (# or //)."""
    for m in pattern.finditer(text):
        yield from _prose_lines(m.group(1), min_len=25, min_words=4)


def _code_lines(text: str):
    """Raw code lines as a secondary MLM stream (identifiers + structure).

    Kept loose on purpose: these are NOT prose, they dilute the heavy
    re-epoching of the small prose corpus with real in-distribution text."""
    for raw in text.splitlines():
        line = raw.strip()
        if len(line) < 12 or len(line) > 200:
            continue
        if len(_ALPHA_RUN.findall(line)) < 2:
            continue
        yield line


def _string_literal_lines(text: str):
    """English prose inside ALL python string constants (docstrings, help
    text, error messages, CLI `detailed_help` dicts …).  Strictly a
    superset of the docstring stream — exact-line dedupe collapses the
    overlap; the big wins are SDK help strings that are not docstrings."""
    try:
        tree = ast.parse(text)
    except Exception:
        return
    for node in ast.walk(tree):
        if (isinstance(node, ast.Constant) and isinstance(node.value, str)
                and len(node.value) >= 25):
            yield from _prose_lines(node.value)


def _block_comment_lines(text: str):
    """Prose in C/C++/JS /* … */ block comments (leading *s stripped)."""
    for m in _C_BLOCK.finditer(text):
        body = _C_BLOCK_STAR.sub("", m.group(0)[2:-2])
        yield from _prose_lines(body)


def _json_desc_lines(obj):
    """Prose in description-like string fields of API schema JSON."""
    if isinstance(obj, dict):
        for k, v in obj.items():
            if (isinstance(v, str) and len(v) >= 25
                    and k in ("description", "title", "documentation",
                              "summary", "help", "detail")):
                yield from _prose_lines(v)
            else:
                yield from _json_desc_lines(v)
    elif isinstance(obj, list):
        for v in obj:
            yield from _json_desc_lines(v)


def build_corpus(max_mb: float = 300.0, code_mb: float = 0.0,
                 verbose: bool = True) -> list[str]:
    """Harvest machine-local English.

    Streams (all near-dupe-deduped, in priority order):
      1. doc prose: site-packages / dist-packages / /usr/share/doc
         *.md/*.rst/*.txt, *.html (tag-stripped), *.gz changelogs
      2. python docstrings + ``#`` comments (one read per file)
      3. ALL python string literals (round 4: SDK help text, error
         messages — the google-cloud-sdk root alone is ~85 MB of prose)
      4. C/C++ header and JS ``//`` line + ``/* */`` block comments
      5. API-schema JSON description fields + gcloud YAML help prose
      6. (optional, ``code_mb``) raw python code lines — secondary stream

    Dedupe key is whitespace-collapsed lowercase with digit runs mapped
    to ``0`` — templated SDK help ("version 1.2.3 of …") collapses to one
    exemplar instead of re-epoching hundreds of near-identical lines.
    """
    import gzip
    import html as html_mod

    roots = [p for p in (
        "/opt/venv/lib/python3.12/site-packages",
        "/usr/lib/python3/dist-packages",
        "/usr/share/doc",
        # round 4: doc prose in roots the doc stage never walked — wheel
        # caches and the SDK tree both ship *.md/*.rst/*.txt documentation
        "/root/.cache/uv/archive-v0",
        "/usr/lib/google-cloud-sdk",
    ) if Path(p).exists()]
    # round 4: prose-heavy roots the round-3 harvest never touched
    extra_py_roots = [p for p in (
        "/usr/lib/google-cloud-sdk",
        "/root/.cache/uv/archive-v0",
    ) if Path(p).exists()]
    c_roots = [p for p in (roots[0] if roots else None, "/usr/include",
                           "/root/.cache/uv/archive-v0")
               if p and Path(p).exists()]
    lines: list[str] = []
    seen = set()
    budget = max_mb * 1e6

    def add(it):
        nonlocal budget
        for line in it:
            key = hash(_DIGITS.sub("0", _WS_RUN.sub(" ", line.lower())))
            if key in seen:
                continue
            seen.add(key)
            lines.append(line)
            budget -= len(line)
            if budget <= 0:
                return False
        return True

    def read(f):
        return Path(f).read_text(encoding="utf-8", errors="ignore")

    def stage(name):
        if verbose:
            print(f"[corpus] {name}: {len(lines)} lines, "
                  f"{(max_mb * 1e6 - budget) / 1e6:.1f} MB", flush=True)

    for root in roots:
        for pat in ("**/*.md", "**/*.rst", "**/*.txt"):
            for f in glob.iglob(f"{root}/{pat}", recursive=True):
                try:
                    if not add(_prose_lines(read(f))):
                        return lines
                except Exception:
                    continue
    # wheel long-descriptions: every installed/cached distribution carries
    # its README in dist-info METADATA / PKG-INFO — real package prose
    for root in roots:
        for pat in ("**/METADATA", "**/PKG-INFO"):
            for f in glob.iglob(f"{root}/{pat}", recursive=True):
                try:
                    if not add(_prose_lines(read(f))):
                        return lines
                except Exception:
                    continue
    stage("doc files")

    for root in roots:
        for f in glob.iglob(f"{root}/**/*.html", recursive=True):
            try:
                txt = html_mod.unescape(_HTML_TAG.sub(" ", read(f)))
                if not add(_prose_lines(txt)):
                    return lines
            except Exception:
                continue
    for f in glob.iglob("/usr/share/doc/**/*.gz", recursive=True):
        try:
            txt = gzip.decompress(Path(f).read_bytes()).decode("utf-8", "ignore")
            if not add(_prose_lines(txt)):
                return lines
        except Exception:
            continue
    stage("html+changelogs")

    py_files = [f for root in roots[:2] + extra_py_roots
                for f in glob.iglob(f"{root}/**/*.py", recursive=True)]
    code_budget = code_mb * 1e6
    code: list[str] = []
    for f in py_files:
        try:
            txt = read(f)
        except Exception:
            continue
        if not add(_docstring_lines(txt)):
            return lines
        if not add(_comment_lines(txt, _PY_COMMENT)):
            return lines
        if not add(_string_literal_lines(txt)):
            return lines
        if code_budget > 0:
            for line in _code_lines(txt):
                key = hash(line)
                if key in seen or code_budget <= 0:
                    continue
                seen.add(key)
                code.append(line)
                code_budget -= len(line)
    stage("py docstrings+comments+literals")

    for root in c_roots:
        for pat in ("**/*.h", "**/*.hpp", "**/*.c", "**/*.cc", "**/*.cpp",
                    "**/*.js"):
            for f in glob.iglob(f"{root}/{pat}", recursive=True):
                try:
                    txt = read(f)
                except Exception:
                    continue
                if not add(_comment_lines(txt, _C_COMMENT)):
                    return lines
                if not add(_block_comment_lines(txt)):
                    return lines
    stage("c/js comments")

    for root in extra_py_roots[:1] + roots[:1]:
        for f in glob.iglob(f"{root}/**/*.json", recursive=True):
            try:
                if not add(_json_desc_lines(json.load(open(
                        f, encoding="utf-8", errors="ignore")))):
                    return lines
            except Exception:
                continue
        for pat in ("**/*.yaml", "**/*.yml"):
            for f in glob.iglob(f"{root}/{pat}", recursive=True):
                try:
                    if not add(_prose_lines(read(f))):
                        return lines
                except Exception:
                    continue
    stage("json+yaml descriptions")

    if code:
        lines.extend(code)
        if verbose:
            print(f"[corpus] +code stream: {len(code)} lines, "
                  f"{(code_mb * 1e6 - code_budget) / 1e6:.1f} MB", flush=True)
    return lines


# ---------------------------------------------------------------------------
# vocab
# ---------------------------------------------------------------------------

def train_vocab(lines: list[str], vocab_size: int,
                trainer: str = "rust") -> list[str]:
    """WordPiece vocab: the Rust tokenizers trainer (fast) or the
    first-party trainer (models/wordpiece_trainer.py — zero third-party
    tokenizer dependency, same likelihood-score merge objective)."""
    if trainer == "first-party":
        from adaptive_classifier_tpu.models.wordpiece_trainer import (
            train_wordpiece_vocab,
        )

        return train_wordpiece_vocab(lines, vocab_size, specials=SPECIALS)
    try:
        from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, trainers

        tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
        tok.normalizer = normalizers.Sequence(
            [normalizers.NFD(), normalizers.Lowercase(), normalizers.StripAccents()]
        )
        tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
        trainer_obj = trainers.WordPieceTrainer(
            vocab_size=vocab_size, special_tokens=SPECIALS,
            continuing_subword_prefix="##",
        )
        tok.train_from_iterator(lines, trainer_obj)
        vocab = tok.get_vocab()
        tokens = [""] * len(vocab)
        for t, i in vocab.items():
            tokens[i] = t
        return tokens
    except Exception as e:  # pragma: no cover
        print(f"Rust trainer unavailable ({e}); first-party trainer")
        return train_vocab(lines, vocab_size, trainer="first-party")


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def pack_examples(lines: list[str], vocab: list[str], seq: int) -> np.ndarray:
    """Tokenize with the first-party WordPiece and pack sentences densely
    into [N, seq] rows: [CLS] s1 [SEP] s2 [SEP] ... padded with [PAD]."""
    from adaptive_classifier_tpu.models.tokenizer import WordPieceTokenizer

    wp = WordPieceTokenizer({t: i for i, t in enumerate(vocab)}, do_lower_case=True)
    native = wp._get_native()
    rows = []
    cur = [wp.cls_id]
    t0 = time.time()
    for i, line in enumerate(lines):
        if native is not None:
            ids = native.encode(line, 10_000)[1:-1].tolist()
        else:
            ids = wp.encode(line, max_length=10_000)[1:-1]
        pos = 0
        while pos < len(ids):
            space = seq - len(cur) - 1
            if space <= 0:
                rows.append(cur + [wp.pad_id] * (seq - len(cur)))
                cur = [wp.cls_id]
                space = seq - 2
            take = ids[pos : pos + space]
            cur += take + [wp.sep_id]
            pos += len(take)
        if len(cur) >= seq - 8:
            rows.append((cur + [wp.pad_id] * seq)[:seq])
            cur = [wp.cls_id]
        if i % 200_000 == 0:
            print(f"  packed {i}/{len(lines)} lines → {len(rows)} rows "
                  f"({time.time()-t0:.0f}s)")
    return np.asarray(rows, np.int32)


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="checkpoints/ac-tiny")
    ap.add_argument("--steps", type=int, default=60_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--vocab-size", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--intermediate", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--corpus-mb", type=float, default=60.0)
    ap.add_argument("--code-mb", type=float, default=0.0,
                    help="secondary raw-code-line stream budget (MB)")
    ap.add_argument("--corpus-cache", default="/tmp/ac_corpus.npz")
    ap.add_argument("--corpus-fraction", type=float, default=1.0,
                    help="train on a seeded random row-subsample of the "
                         "packed corpus (scaling-curve points)")
    ap.add_argument("--checkpoint-every", type=int, default=5000)
    ap.add_argument("--snapshot-steps", default="",
                    help="comma-separated step marks: save step-stamped "
                         "checkpoint dirs ({out}-s{N}) for downstream "
                         "checkpoint selection (round-3 protocol)")
    ap.add_argument("--vocab-trainer", default="rust",
                    choices=["rust", "first-party"])
    ap.add_argument("--contrastive-steps", type=int, default=4000,
                    help="unsupervised sentence-embedding phase after MLM")
    ap.add_argument("--contrastive-mask-prob", type=float, default=0.1)
    ap.add_argument("--mlm-out", default=None,
                    help="also save the MLM-only weights here (pre-contrastive)")
    ap.add_argument("--pooling", default="mean", choices=["mean", "cls"])
    ap.add_argument("--init-from", default=None,
                    help="existing HF-layout checkpoint to continue from")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from adaptive_classifier_tpu.models.encoder import EncoderConfig
    from adaptive_classifier_tpu import pretrain, training

    cache = Path(args.corpus_cache)
    if cache.exists():
        blob = np.load(cache, allow_pickle=True)
        packed, vocab = blob["packed"], list(blob["vocab"])
        print(f"corpus cache: {packed.shape} rows, vocab {len(vocab)}")
    else:
        print("building corpus…")
        lines = build_corpus(args.corpus_mb, code_mb=args.code_mb)
        print(f"corpus: {len(lines)} lines, {sum(map(len, lines))/1e6:.1f} MB")
        vocab = train_vocab(lines, args.vocab_size, trainer=args.vocab_trainer)
        print(f"vocab: {len(vocab)} tokens")
        packed = pack_examples(lines, vocab, args.seq)
        print(f"packed: {packed.shape}")
        np.savez_compressed(cache, packed=packed, vocab=np.asarray(vocab, object))

    if args.corpus_fraction < 1.0:
        rng = np.random.default_rng(0)
        perm = rng.permutation(packed.shape[0])
        packed = packed[np.sort(perm[: int(packed.shape[0] * args.corpus_fraction)])]
        print(f"corpus fraction {args.corpus_fraction}: {packed.shape[0]} rows")

    cfg = EncoderConfig(
        vocab_size=len(vocab), hidden_size=args.hidden, num_layers=args.layers,
        num_heads=args.heads, intermediate_size=args.intermediate,
        max_position_embeddings=max(args.seq, 512),
    )
    mask_id = vocab.index("[MASK]")
    if args.init_from:
        from adaptive_classifier_tpu.models.encoder import (
            _load_state_dict, _map_hf_weights,
        )

        params = _map_hf_weights(_load_state_dict(Path(args.init_from)), cfg)
        print(f"continuing from {args.init_from}")
    else:
        params = pretrain.init_params(0, cfg)
    mlm = pretrain.init_mlm(0, cfg)
    opt = training.adamw_init({"enc": params, "mlm": mlm})
    key = jax.random.PRNGKey(0)

    N = packed.shape[0]
    ids_dev = jnp.asarray(packed)
    attn_dev = jnp.asarray((packed != 0).astype(np.int32))
    out_dir = Path(args.out)

    print(f"training {args.steps} steps, batch {args.batch}, seq {args.seq}, "
          f"{N} packed rows")
    t0 = time.time()
    losses = []
    CHUNK = 250  # steps per XLA program (lax.scan) — one dispatch per chunk
    step = 0
    while step < args.steps:
        n = min(CHUNK, args.steps - step)
        key, sub = jax.random.split(key)
        params, mlm, opt, loss = pretrain.train_chunk(
            params, mlm, opt, ids_dev, attn_dev, sub, cfg,
            mask_id, args.batch, n, lr_peak=args.lr, warmup=2000,
            total_steps=args.steps,
        )
        step += n
        lv = float(loss)
        losses.append((step, lv))
        print(f"step {step:6d}  mean-loss {lv:.4f}  "
              f"({(time.time()-t0):.0f}s)", flush=True)
        if step % args.checkpoint_every < CHUNK:
            pretrain.save_hf_checkpoint(params, cfg, out_dir, vocab,
                                        extra_config={"ac_tiny_step": step})
            (out_dir / "loss_log.json").write_text(json.dumps(losses))
        for s in (int(x) for x in args.snapshot_steps.split(",") if x):
            if step - n < s <= step:
                pretrain.save_hf_checkpoint(
                    params, cfg, Path(f"{args.out}-s{s}"), vocab,
                    extra_config={"ac_tiny_step": step})

    if args.mlm_out:
        pretrain.save_hf_checkpoint(params, cfg, Path(args.mlm_out), vocab,
                                    extra_config={"ac_tiny_step": args.steps})
    # unsupervised contrastive phase: shapes sentence geometry for the
    # classifier's kNN/prototypes (MLM-only pooled states are weak)
    if args.contrastive_steps > 0:
        copt = training.adamw_init(params)
        done = 0
        while done < args.contrastive_steps:
            n = min(CHUNK, args.contrastive_steps - done)
            key, sub = jax.random.split(key)
            params, copt, closs = pretrain.contrastive_chunk(
                params, copt, ids_dev, attn_dev, sub, cfg, mask_id,
                min(args.batch, 256), n, lr=1e-4,
                view_mask_prob=args.contrastive_mask_prob)
            done += n
            print(f"contrastive {done:5d}  mean-loss {float(closs):.4f}  "
                  f"({(time.time()-t0):.0f}s)", flush=True)
            losses.append((args.steps + done, float(closs)))

    extra = {"ac_tiny_step": args.steps,
             "ac_contrastive_steps": args.contrastive_steps}
    if args.pooling != "cls":
        extra["ac_pooling"] = args.pooling
    pretrain.save_hf_checkpoint(params, cfg, out_dir, vocab, extra_config=extra)
    (out_dir / "loss_log.json").write_text(json.dumps(losses))
    print(f"saved {out_dir}; final loss "
          f"{losses[-1][1]:.4f}" if losses else f"saved {out_dir}")


if __name__ == "__main__":
    main()
