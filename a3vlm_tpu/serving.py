"""Single-process serving facade (reference model/accessory/
model/multi_gpu_wrapper.py): the torch version spawns one subprocess per GPU
with a gloo RPC control plane so a single-process app can drive an MP-sharded
model (:49-116, :143-320). Under SPMD JAX one controller process already
drives the whole mesh, so the wrapper reduces to a convenience class that:

- builds/loads a MetaModel,
- places params on a ("data","model") mesh,
- exposes the same generate / stream_generate / compute_logits /
  evaluate_examples surface with host-side image arrays.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import jax
import numpy as np


class ModelServer:
    def __init__(
        self,
        pretrained_path: Optional[str | list] = None,
        llama_type: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        model_parallel_size: int = 1,
        max_seq_len: int = 4096,
        quant: bool = False,
        meta_model=None,
        kv_cache_bits: Optional[int] = None,
    ):
        from a3vlm_tpu.meta import MetaModel
        from a3vlm_tpu.parallel import create_mesh

        if meta_model is not None:
            self.model = meta_model
        else:
            self.model = MetaModel.from_pretrained(
                pretrained_path,
                llama_type=llama_type,
                tokenizer_path=tokenizer_path,
                with_visual=True,
                max_seq_len=max_seq_len,
                # mp-aligned vocab pad: keeps the column-parallel lm head's
                # TP shards lane-aligned at mp > 2 (tail masked via
                # true_vocab)
                vocab_align=model_parallel_size * 128,
            )
            if quant:
                # tp_align pads the ffn hidden dim so the quantized gate/up
                # weights' TP output shards stay lane-aligned at this mp;
                # row_parallel chunk-packs wo/w2 so they K-shard (psum of
                # partials) instead of forcing activation all-gathers
                self.model.quantize(
                    tp_align=model_parallel_size * 128
                    if model_parallel_size > 1 else 0,
                    row_parallel=model_parallel_size
                    if model_parallel_size > 1 else 0,
                )
        if kv_cache_bits is not None:
            # int8 KV cache (serving extension; ops/decode_attention.py)
            self.model.kv_cache_bits = kv_cache_bits
        self.mesh = create_mesh(model_parallel_size)
        self._place_params()

    def _place_params(self):
        from a3vlm_tpu.models import ens5 as ens5_mod
        from a3vlm_tpu.models import llama as llama_mod
        from a3vlm_tpu.parallel import shard_params
        from a3vlm_tpu.quant import QuantizedWeight, quantized_partition_specs

        m = self.model
        has_quant = any(
            isinstance(x, QuantizedWeight)
            for x in jax.tree_util.tree_leaves(
                m.params,
                is_leaf=lambda x: isinstance(x, QuantizedWeight),
            )
        )
        if m.llama_type.startswith("llama_ens5"):
            specs = ens5_mod.ens5_partition_specs(m.cfg, m.params)
        elif m.llama_type == "llama":
            specs = llama_mod.llama_partition_specs(m.cfg)
        else:
            return
        if has_quant:
            # quantized leaves shard all-column-parallel (output dim over
            # "model"); the fused kernels partition along it through the
            # custom_partitioning wrappers in ops/quant_matmul.py
            specs = quantized_partition_specs(
                specs, m.params, self.mesh.shape.get("model", 1)
            )
        m.params = shard_params(m.params, self.mesh, specs)
        m.mesh = self.mesh
        m._generator = None

    # -- API (multi_gpu_wrapper.py:260-320 surface) --------------------------

    def generate(
        self,
        prompts: List[str],
        images=None,
        max_gen_len: int = 512,
        temperature: float = 0.0,
        top_p: float = 0.95,
        additional_stop_symbols: Iterable[str] = (),
        **kw,
    ) -> List[str]:
        # **kw delegation (like stream_generate below): every MetaModel
        # generate kwarg — fsm, draft_k, seed, future ones — flows through
        # without this facade having to chase the signature.
        with self.mesh:
            return self.model.generate(
                prompts,
                images=None if images is None else np.asarray(images),
                max_gen_len=max_gen_len,
                temperature=temperature,
                top_p=top_p,
                additional_stop_symbols=additional_stop_symbols,
                **kw,
            )

    def stream_generate(self, prompt: str, image=None, **kw):
        with self.mesh:
            yield from self.model.stream_generate(prompt, image=image, **kw)

    def compute_logits(self, examples, images=None, **kw):
        with self.mesh:
            return self.model.compute_logits(examples, images=images, **kw)

    def evaluate_examples(self, examples, contexts=None, images=None, **kw):
        with self.mesh:
            return self.model.evaluate_examples(
                examples, contexts=contexts, images=images, **kw
            )
