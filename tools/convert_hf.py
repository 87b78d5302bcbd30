"""Convert a HuggingFace checkpoint directory into a flashattn_tpu Orbax
checkpoint + config JSON.

Usage:
  python tools/convert_hf.py --src /path/to/hf_model --dst /path/to/out \
      [--dtype bf16|f32]

Loads the HF model on CPU via transformers, maps weights through
models/convert.py (Llama, Mistral, Qwen2, Qwen3, Phi-3, Gemma-2 — the
parity-tested families), and writes:
  dst/params/...   Orbax checkpoint of the param pytree
  dst/config.json  the ModelConfig fields (load with load_converted)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert(src: str, dst: str, dtype_name: str = "bf16") -> None:
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import transformers

    from flashattn_tpu.models.convert import config_from_hf, params_from_hf

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    hf_cfg = transformers.AutoConfig.from_pretrained(src)
    model = transformers.AutoModelForCausalLM.from_pretrained(src)
    cfg = config_from_hf(hf_cfg, dtype=dtype)
    params = params_from_hf(model.state_dict(), cfg)

    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((out / "params").absolute(), params, force=True)
    ckptr.wait_until_finished()
    fields = dataclasses.asdict(cfg)
    fields["dtype"] = dtype_name
    (out / "config.json").write_text(json.dumps(fields, indent=1))
    print(f"converted {hf_cfg.model_type} -> {out} "
          f"({sum(x.size for x in params_leaves(params)):,} params, "
          f"{dtype_name})")


def params_leaves(params):
    import jax

    return jax.tree_util.tree_leaves(params)


def load_config(dst: str):
    """Load the saved config.json -> hashable ModelConfig."""
    import jax.numpy as jnp

    from flashattn_tpu.models.config import ModelConfig

    fields = json.loads((Path(dst) / "config.json").read_text())
    fields["dtype"] = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        fields["dtype"]]

    # JSON turns tuples into lists; ModelConfig must stay hashable (it is a
    # static argument of every jitted entry point), so restore tuples —
    # recursively, for nested fields like rope_longrope's factor sets.
    def tuplify(x):
        return tuple(tuplify(e) for e in x) if isinstance(x, list) else x

    return ModelConfig(**{k: tuplify(v) for k, v in fields.items()})


def load_converted(dst: str):
    """Load a converted checkpoint -> (params, ModelConfig)."""
    import orbax.checkpoint as ocp

    cfg = load_config(dst)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore((Path(dst) / "params").absolute())
    return params, cfg


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="HF model dir or hub name")
    ap.add_argument("--dst", required=True, help="output directory")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    convert(args.src, args.dst, args.dtype)
