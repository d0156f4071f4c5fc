"""MetaModel — the universal model wrapper / library API (reference
model/accessory/model/meta.py).

Bundles a model family (dispatched by ``llama_type``, meta.py:30), its
parameter pytree, the tokenizer, and an optional mesh; exposes the
reference's API surface:

- ``forward``: next-token loss over (examples, labels[, images])
- ``generate`` / ``stream_generate``: batched KV-cached generation with
  top-p, multi-token stop symbols and image splicing
- ``compute_logits`` / ``evaluate_examples``: scoring APIs
- ``from_pretrained``: probe meta.json/config.json/tokenizer, load
  consolidated torch checkpoints (decoder weights; vision-tower torch trees
  import via checkpoint/torch_import helpers)
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from a3vlm_tpu.config import ModelArgs, model_args_from_json, probe_pretrained_dir
from a3vlm_tpu.generation import Generator
from a3vlm_tpu.models import ens5 as ens5_mod
from a3vlm_tpu.models import llama as llama_mod
from a3vlm_tpu.tokenizer import Tokenizer, probe_tokenizer_path_from_pretrained
from a3vlm_tpu.train.losses import next_token_loss


class MetaModel:
    def __init__(
        self,
        llama_type: str,
        llama_config: Optional[Sequence[str]] = None,
        tokenizer_path: Optional[str] = None,
        with_visual: bool = False,
        max_seq_len: int = 2048,
        dtype=jnp.float32,
        params=None,
        tokenizer: Optional[Tokenizer] = None,
        seed: int = 0,
        model_cfg=None,
        vocab_align: int = 128,
    ):
        self.llama_type = llama_type
        self.with_visual = with_visual
        self.tokenizer = tokenizer or Tokenizer(tokenizer_path)

        # pad the embedding/head vocab to a lane multiple so the TP split of
        # the column-parallel lm head divides evenly on any mesh (the
        # reference relies on 32000 % mp == 0; arbitrary tokenizers don't).
        # padded logits are masked out of losses and sampling (true_vocab).
        # ``vocab_align`` > 128 (mp * 128) keeps the head's TP shards
        # lane-aligned at mp > 2 — 32000 doesn't divide at mp=4/8, and a
        # replicated int4 head would be ~10% of per-step decode traffic.
        self.true_vocab = self.tokenizer.n_words
        align = max(128, vocab_align)
        padded_vocab = -(-self.true_vocab // align) * align
        overrides = dict(max_seq_len=max_seq_len, vocab_size=padded_vocab)
        self._gen_ops = None  # default llama ops
        if llama_type == "llama":
            args = (
                model_args_from_json(llama_config or [], **overrides)
                if llama_config
                else ModelArgs(**overrides)
            )
            self.cfg = args
            self.args = args
            self._mod = llama_mod
            self.image_words = 0
            if params is None:
                params = llama_mod.init_llama_params(
                    jax.random.PRNGKey(seed), args, dtype
                )
        elif llama_type == "falcon":
            from a3vlm_tpu.generation import FALCON_GEN_OPS
            from a3vlm_tpu.models import falcon as falcon_mod

            if model_cfg is not None:
                args = model_cfg
            else:
                import json as _json

                cfg_dict = {}
                for p in llama_config or []:
                    with open(p) as f:
                        cfg_dict.update(_json.load(f))
                fields = {
                    f.name
                    for f in dataclasses.fields(falcon_mod.FalconArgs)
                }
                args = falcon_mod.FalconArgs(
                    **{k: v for k, v in cfg_dict.items() if k in fields},
                )
            args = dataclasses.replace(
                args, vocab_size=padded_vocab, max_seq_len=max_seq_len
            )
            self.cfg = args
            self.args = args
            self._mod = falcon_mod
            self.image_words = 0
            self._gen_ops = FALCON_GEN_OPS
            if params is None:
                params = falcon_mod.init_falcon_params(
                    jax.random.PRNGKey(seed), args, dtype
                )
        elif llama_type in ("llama_ens5", "llama_ens5_2images"):
            if model_cfg is not None:
                cfg = model_cfg
            else:
                args = (
                    model_args_from_json(llama_config or [], **overrides)
                    if llama_config
                    else ModelArgs(**overrides)
                )
                cfg = ens5_mod.Ens5Config(llama=args)
            # vocab always comes from the tokenizer (meta.py:62-66), padded
            if cfg.llama.vocab_size != padded_vocab:
                cfg = dataclasses.replace(
                    cfg, llama=cfg.llama.replace(vocab_size=padded_vocab)
                )
            self.cfg = cfg
            self.args = cfg.llama
            self._mod = ens5_mod
            self.image_words = cfg.image_words if with_visual else 0
            if llama_type == "llama_ens5_2images":
                from a3vlm_tpu.models import ens5_2images as e2_mod

                self._mod = e2_mod
                self.image_words *= 2  # RGB + depth (llama_ens5_2images:335)
                if params is None:
                    params = e2_mod.init_params(
                        jax.random.PRNGKey(seed), cfg, dtype
                    )
            elif params is None:
                params = ens5_mod.init_ens5_params(
                    jax.random.PRNGKey(seed), cfg, dtype
                )
        elif llama_type == "internlm_ems5_light":
            from a3vlm_tpu.models import internlm_ems5_light as il_mod

            cfg = model_cfg or il_mod.InternlmEns5Config()
            if cfg.llama.vocab_size != padded_vocab:
                cfg = dataclasses.replace(
                    cfg, llama=cfg.llama.replace(vocab_size=padded_vocab)
                )
            self.cfg = cfg
            self.args = cfg.llama
            self._mod = il_mod
            self.image_words = cfg.image_words if with_visual else 0
            if params is None:
                params = il_mod.init_params(
                    jax.random.PRNGKey(seed), cfg, dtype
                )
        else:
            raise KeyError(f"unknown llama_type: {llama_type}")

        self.params = params
        self.mesh = None  # set by ModelServer / callers for multi-chip decode
        self._kv_cache_bits: Optional[int] = None
        self._prefill_chunk: Optional[int] = None
        self._generator: Optional[Generator] = None
        self._encode_image_jit = None
        self._params_transform = None  # set by quantize()

    # -- loading ------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        pretrained_path: str | List[str],
        llama_type: Optional[str] = None,
        llama_config: Optional[Sequence[str]] = None,
        tokenizer_path: Optional[str] = None,
        with_visual: bool = False,
        max_seq_len: int = 4096,
        dtype=jnp.bfloat16,
        quant: bool = False,
        vocab_align: int = 128,
    ) -> "MetaModel":
        """(meta.py:88-222). Probes meta.json (llama_type), config.json
        (llama_config) and the tokenizer under pretrained_path; loads
        consolidated checkpoints sequentially (diff checkpoints add onto the
        preceding base)."""
        from a3vlm_tpu.checkpoint.torch_import import (
            apply_diff_checkpoint,
            import_llama_consolidated,
            load_consolidated_dir,
        )

        paths = (
            [pretrained_path]
            if isinstance(pretrained_path, str)
            else list(pretrained_path)
        )
        probed = probe_pretrained_dir(paths[-1])
        llama_type = llama_type or probed.get("llama_type") or "llama"
        if llama_config is None and "llama_config" in probed:
            cfg_file = Path(paths[-1]) / "config.json"
            llama_config = [str(cfg_file)] if cfg_file.exists() else None
        if tokenizer_path is None:
            for p in paths[::-1]:
                tokenizer_path = probe_tokenizer_path_from_pretrained(p)
                if tokenizer_path is not None:
                    break
        if tokenizer_path is None:
            raise FileNotFoundError(
                f"no tokenizer found under {paths}; pass tokenizer_path"
            )

        model = cls(
            llama_type=llama_type,
            llama_config=llama_config,
            tokenizer_path=tokenizer_path,
            with_visual=with_visual,
            max_seq_len=max_seq_len,
            dtype=dtype,
            vocab_align=vocab_align,
        )

        merged = None
        for p in paths:
            sd, fmt = load_consolidated_dir(p)
            if fmt == "diff" and merged is not None:
                merged = apply_diff_checkpoint(merged, sd)
            else:
                merged = sd
        if merged:
            from a3vlm_tpu.checkpoint.ens5_import import (
                has_ens5_towers,
                import_ens5_consolidated,
            )

            def to_dev(tree):
                return jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x, dtype)
                    if np.asarray(x).dtype.kind == "f"
                    else jnp.asarray(x),
                    tree,
                )

            if model.llama_type.startswith("llama_ens5") and has_ens5_towers(
                merged
            ):
                # the full released checkpoint: decoder + all four torch-
                # library tower trees + projectors/tags in one state dict
                model.params = to_dev(
                    import_ens5_consolidated(merged, model.cfg)
                )
            elif model.llama_type == "llama":
                model.params = to_dev(
                    import_llama_consolidated(
                        merged, n_layers=model.args.n_layers
                    )
                )
            else:
                decoder = import_llama_consolidated(
                    merged, n_layers=model.args.n_layers
                )
                model.params = dict(model.params)
                model.params["llama"] = to_dev(decoder)
                # projectors + image tags, when present in the checkpoint
                model.params.update(to_dev(_import_ens5_extras(merged)))
            model._pad_vocab_entries()
        if quant:
            model.quantize()
        return model

    def _pad_vocab_entries(self) -> None:
        """Zero-pad imported embedding rows / lm-head columns up to the
        config's padded vocab. Checkpoints carry the true vocab; every
        logits consumer masks the tail with ``true_vocab``, and token ids
        never index past the tokenizer's n_words."""
        V = self.args.vocab_size
        tree = (
            self.params["llama"]
            if self.llama_type.startswith(("llama_ens5", "internlm"))
            else self.params
        )
        emb_key = (
            "word_embeddings"
            if self.llama_type == "falcon"
            else "tok_embeddings"
        )
        emb = jnp.asarray(tree[emb_key]["weight"])
        if emb.shape[0] < V:
            tree[emb_key]["weight"] = jnp.pad(
                emb, ((0, V - emb.shape[0]), (0, 0))
            )
        head = jnp.asarray(tree["output"]["weight"])
        if head.shape[-1] < V:
            tree["output"]["weight"] = jnp.pad(
                head, ((0, 0), (0, V - head.shape[-1]))
            )

    def quantize(self, bits: Optional[int] = 4, tp_align: int = 0,
                 row_parallel: int = 0, tower_bits: Optional[int] = None
                 ) -> None:
        """Post-hoc weight-only quantization of the decoder (the NF4 eval
        path, eval_affordance_with_quant.py:327-342). Vision towers and
        projectors stay dense (quant blocklist).

        Weights stay packed in HBM and flow into the decoder's ``qmat``
        linears: both widths dispatch to Pallas fused dequant-matmul
        kernels on TPU (ops/quant_matmul.py) — the analogue of
        bitsandbytes' fused Linear8bitLt/Linear4bit forwards. (XLA alone
        does NOT fuse the dequant into the dot; it materializes the bf16
        weight — the kernels exist because of that.)

        ``tp_align`` (model_parallel_size * 128): pad the ffn hidden dim so
        TP output sharding of the quantized gate/up weights stays
        lane-aligned at mp>2 (quant.quantize_params).

        ``row_parallel`` (model_parallel_size): chunk-pack wo/w2 so they
        K-shard (true row-parallel TP with a psum of partials) instead of
        column-sharding with activation all-gathers — see
        quant.quantize_params.

        ``tower_bits=8`` (multimodal types only, opt-in, beyond the
        reference): per-channel int8 on the frozen vision towers so the
        five-crop encode contracts on the int8 MXU at 2x the bf16 rate
        (ens5.quantize_tower_params / ops.quant_matmul.w8a8_matmul —
        activation rounding is NOT exact; gated by tests/test_w8a8.py)."""
        from a3vlm_tpu.quant import quantize_params

        if self.llama_type in ("llama", "falcon"):
            if bits:
                self.params = quantize_params(
                    self.params, bits=bits, tp_align=tp_align,
                    row_parallel=row_parallel,
                )
        else:
            self.params = dict(self.params)
            if bits:
                self.params["llama"] = quantize_params(
                    self.params["llama"], bits=bits, tp_align=tp_align,
                    row_parallel=row_parallel,
                )
            if tower_bits:
                assert tower_bits == 8, "towers support W8A8 only"
                from a3vlm_tpu.models import ens5 as ens5_mod

                self.params = ens5_mod.quantize_tower_params(self.params)
        self._params_transform = None  # qmat consumes packed leaves directly
        self._generator = None

    def load_lora(self, lora_tree) -> None:
        """Attach trained LoRA adapters for serving WITHOUT merging: the
        decoder forward runs ``qmat(x, base) + (x @ a) @ b`` per targeted
        linear (quant.LoraWeight). Exact for packed (quantized) and
        tp_align-padded bases, where folding the delta into the weights is
        impossible or lossy. Call after ``quantize()`` — quantizing resets
        any attached transform. Adapters whose padded geometry exceeds the
        current base (trained against a tp_align-padded quant base, served
        dense) are sliced to fit; only lora-through-padded-channel
        second-order terms are dropped."""
        from a3vlm_tpu.train.lora import attach_lora, fit_lora_to

        decoder = (
            self.params
            if self.llama_type in ("llama", "falcon")
            else self.params["llama"]
        )
        fitted = fit_lora_to(decoder, lora_tree)

        prev = self._params_transform

        def transform(p):
            q = prev(p) if prev is not None else p
            return attach_lora(q, fitted)

        self._params_transform = transform
        self._generator = None

    def load_adapter_checkpoint(self, ckpt_dir: str, merge: bool = False) -> None:
        """Consume a trainable-only train checkpoint (``--only_save_trainable``
        from a ``--lora_rank`` / ``--quant`` run): overlays the dense
        trainables (norms, biases, projectors, image tags) onto the current
        params and attaches the LoRA adapters as serving side-paths
        (``merge=True`` folds them into dense weights instead —
        tools/merge_lora.py export flow; requires an unquantized base). The
        reference analogue is loading a delta checkpoint on top of a base
        (util/tensor_parallel.py:425-485 sequential loading)."""
        from a3vlm_tpu.checkpoint.manager import restore_raw_checkpoint

        raw = restore_raw_checkpoint(ckpt_dir)
        lora_tree = raw.pop("lora", None) if isinstance(raw, dict) else None

        def overlay(base, new):
            if new is None:
                return base
            if isinstance(base, dict) and isinstance(new, dict):
                return {
                    k: overlay(v, new[k]) if k in new else v
                    for k, v in base.items()
                }
            if hasattr(base, "shape") and hasattr(new, "shape") and (
                tuple(base.shape) == tuple(new.shape)
            ):
                return jnp.asarray(new).astype(base.dtype)
            return base

        self.params = overlay(self.params, raw)
        if lora_tree is not None:
            if merge:
                from a3vlm_tpu.train.lora import fit_lora_to, merge_lora

                is_wrapped = self.llama_type not in ("llama", "falcon")
                decoder = (
                    self.params["llama"] if is_wrapped else self.params
                )
                merged = merge_lora(decoder, fit_lora_to(decoder, lora_tree))
                if is_wrapped:
                    self.params = {**self.params, "llama": merged}
                else:
                    self.params = merged
            else:
                self.load_lora(lora_tree)
        self._generator = None

    # -- API ------------------------------------------------------------------

    def encode_images(self, images, depth_images=None) -> Optional[jnp.ndarray]:
        if images is None:
            return None
        if self.llama_type == "llama_ens5_2images":
            assert depth_images is not None, (
                "llama_ens5_2images requires depth images "
                "(llama_ens5_2images.py:518-547)"
            )
            if self._encode_image_jit is None:
                cfg = self.cfg
                mod = self._mod
                self._encode_image_jit = jax.jit(
                    lambda p, im, dm: mod.build_image_tokens(p, cfg, im, dm)
                )
            return self._encode_image_jit(
                self.params, jnp.asarray(images), jnp.asarray(depth_images)
            )
        if self._encode_image_jit is None:
            cfg = self.cfg
            mod = self._mod
            self._encode_image_jit = jax.jit(
                lambda p, im: mod.build_image_tokens(p, cfg, im)
            )
        return self._encode_image_jit(self.params, jnp.asarray(images))

    def _decoder_params(self):
        p = (
            self.params
            if self.llama_type in ("llama", "falcon")
            else self.params["llama"]
        )
        if self._params_transform is not None:
            p = self._params_transform(p)
        return p

    def forward(self, examples, labels, images=None, depth_images=None):
        """Training loss (meta.py:234-263): CE(ignore 0), logits shifted."""
        if self.llama_type == "falcon":
            from a3vlm_tpu.models import falcon as falcon_mod

            logits = falcon_mod.forward_train(
                self._decoder_params(), self.args, jnp.asarray(examples)
            )
            return next_token_loss(
                logits, jnp.asarray(labels), vocab_size=self.true_vocab
            )
        image_tokens = self.encode_images(images, depth_images)
        logits = llama_mod.forward_train(
            self._decoder_params(),
            self.args,
            jnp.asarray(examples),
            image_tokens=image_tokens,
        )
        return next_token_loss(
            logits, jnp.asarray(labels), vocab_size=self.true_vocab
        )

    @property
    def kv_cache_bits(self) -> Optional[int]:
        """8 -> int8 KV cache (serving extension; generation.py). Setting
        it invalidates any cached Generator so the change takes effect on
        the next generate() instead of being silently ignored."""
        return self._kv_cache_bits

    @kv_cache_bits.setter
    def kv_cache_bits(self, value: Optional[int]) -> None:
        assert value in (None, 8), value
        if value != self._kv_cache_bits:
            self._kv_cache_bits = value
            self._generator = None

    @property
    def prefill_chunk(self) -> Optional[int]:
        """Memory-bounded prefill chunk (llama.prefill_chunked): a one-shot
        unrolled int4 prefill at batch 16 x ~1.5k spliced tokens allocates
        multi-GB [B*S, K] matmul temps and OOMs v5e-1 — chunking bounds the
        temps at O(chunk). Same invalidation contract as kv_cache_bits."""
        return self._prefill_chunk

    @prefill_chunk.setter
    def prefill_chunk(self, value: Optional[int]) -> None:
        if value != self._prefill_chunk:
            self._prefill_chunk = value
            self._generator = None

    def _get_generator(self) -> Generator:
        if self._generator is None:
            # swap the stored decoder params to the per-layer decode layout
            # so the Generator and MetaModel share ONE copy of the weights
            # (llama.unstack_layers; training paths re-stack on use)
            if self.llama_type in ("llama", "falcon"):
                self.params = llama_mod.unstack_layers(self.params)
                params = self.params
            else:
                self.params["llama"] = llama_mod.unstack_layers(
                    self.params["llama"]
                )
                params = self.params["llama"]
            kw = {}
            if self._gen_ops is not None:
                kw["ops"] = self._gen_ops
            self._generator = Generator(
                params, self.args, self.tokenizer,
                image_words=self.image_words, vocab_limit=self.true_vocab,
                params_transform=self._params_transform, mesh=self.mesh,
                kv_cache_bits=self._kv_cache_bits,
                prefill_chunk=self._prefill_chunk,
                **kw,
            )
        return self._generator

    def generate(
        self,
        prompts: List[str],
        images=None,
        depth_images=None,
        max_gen_len: int = 512,
        temperature: float = 0.0,
        top_p: float = 0.95,
        additional_stop_symbols: Iterable[str] = (),
        seed: int = 0,
        fsm=None,
        draft_k: int = 0,
        lookup_max_n: int = 4,
    ) -> List[str]:
        image_tokens = self.encode_images(images, depth_images)
        return self._get_generator().generate(
            prompts,
            image_tokens=image_tokens,
            max_gen_len=max_gen_len,
            temperature=temperature,
            top_p=top_p,
            additional_stop_symbols=additional_stop_symbols,
            seed=seed,
            fsm=fsm,
            draft_k=draft_k,
            lookup_max_n=lookup_max_n,
        )

    def stream_generate(
        self,
        prompt: str,
        image=None,
        max_gen_len: int = 512,
        temperature: float = 0.0,
        top_p: float = 0.95,
        additional_stop_symbols: Iterable[str] = (),
    ):
        """Single-prompt streaming generation (meta.py:487-566): yields
        {"text", "end_of_content"} dicts. Host-loop decode (one jitted step
        per token) so tokens stream as they are produced."""
        if image is not None and np.ndim(image) == 3:
            image = np.asarray(image)[None]
        image_tokens = self.encode_images(image)
        tok = self.tokenizer
        args = self.args
        max_seq_len = args.max_seq_len - (
            self.image_words if image_tokens is not None else 0
        )
        prompt_tokens = tok.encode(prompt, bos=True, eos=False)
        prompt_tokens = prompt_tokens[-(max_seq_len - max_gen_len):]
        total_len = min(max_seq_len, max_gen_len + len(prompt_tokens))

        params = self._decoder_params()
        W = 0 if image_tokens is None else image_tokens.shape[1]
        from a3vlm_tpu.generation import LLAMA_GEN_OPS

        from a3vlm_tpu.ops.decode_attention import kv_cache_dtype

        ops = self._gen_ops or LLAMA_GEN_OPS
        cache = ops.create_cache(
            args, 1, total_len + W, kv_cache_dtype(self.kv_cache_bits)
        )
        logits, cache, _ = ops.prefill(
            params, args, cache,
            jnp.asarray([prompt_tokens], jnp.int32),
            image_tokens, "auto",
        )
        rng = jax.random.PRNGKey(0)
        generated: list[int] = []
        from a3vlm_tpu.ops.sampling import sample_token

        for cur_pos in range(len(prompt_tokens), total_len):
            rng, sub = jax.random.split(rng)
            next_token = int(
                sample_token(
                    sub, logits[:, : self.true_vocab], temperature, top_p
                )[0]
            )
            if next_token == tok.eos_id:
                break
            generated.append(next_token)
            text = tok.decode(generated)
            for stop_symbol in additional_stop_symbols:
                stop_pos = text.find(stop_symbol)
                if stop_pos != -1:
                    yield {"text": text[:stop_pos], "end_of_content": True}
                    return
            yield {"text": text, "end_of_content": False}
            logits, cache = ops.decode_step(
                params, args, cache,
                jnp.asarray([[next_token]], jnp.int32),
                jnp.int32(cur_pos + W), "auto",
            )
        yield {"text": tok.decode(generated), "end_of_content": True}

    def compute_logits(
        self, examples: List, images=None, bos=True, eos=False
    ) -> List[np.ndarray]:
        """(meta.py:265-304): right-padded batch forward; per-item logits
        trimmed to their true length."""
        if isinstance(examples, str):
            raise ValueError("compute_logits expects a batched LIST")
        if isinstance(examples[0], str):
            examples = [
                self.tokenizer.encode(e, bos, eos) for e in examples
            ]
        lens = [len(e) for e in examples]
        B, L = len(examples), max(lens)
        toks = np.zeros((B, L), np.int32)
        for i, e in enumerate(examples):
            toks[i, : len(e)] = e
        if self.llama_type == "falcon":
            from a3vlm_tpu.models import falcon as falcon_mod

            logits = falcon_mod.forward_train(
                self._decoder_params(), self.args, jnp.asarray(toks)
            )
        else:
            image_tokens = self.encode_images(images)
            logits = llama_mod.forward_train(
                self._decoder_params(), self.args, jnp.asarray(toks),
                image_tokens=image_tokens,
            )
        logits = np.asarray(logits.astype(jnp.float32))[..., : self.true_vocab]
        return [l[:n] for l, n in zip(logits, lens)]

    def evaluate_examples(
        self, examples: List, contexts: Optional[List] = None, images=None,
        bos=True, eos=False,
    ) -> dict:
        """(meta.py:306-377): per-example log-likelihood / ppl / greedy-match
        over the non-context suffix."""
        if isinstance(examples, str):
            raise ValueError("evaluate_examples expects a batched LIST")
        if isinstance(examples[0], str):
            examples = [self.tokenizer.encode(e, bos, eos) for e in examples]
            if contexts is not None:
                contexts = [
                    self.tokenizer.encode(c, bos, False) for c in contexts
                ]
        if contexts is not None:
            assert all(
                e[: len(c)] == c for e, c in zip(examples, contexts)
            )

        logits = self.compute_logits(examples, images)
        result = {
            "log_likelihood": [],
            "ppl": [],
            "max_equal": [],
            "non_context_logits": [],
        }
        for idx, item_logits in enumerate(logits):
            start = 0 if contexts is None else len(contexts[idx]) - 1
            assert start >= 0
            item_logits = item_logits[start:-1]
            labels = np.asarray(examples[idx][start + 1:])
            logp = jax.nn.log_softmax(jnp.asarray(item_logits), axis=-1)
            token_ll = np.asarray(
                jnp.take_along_axis(logp, jnp.asarray(labels)[:, None], axis=1)
            )[:, 0]
            valid = labels != 0
            losses = np.where(valid, -token_ll, 0.0)
            n = max(int(valid.sum()), 1)
            result["log_likelihood"].append(float(-losses.sum()))
            result["ppl"].append(float(losses.sum() / n))
            result["max_equal"].append(
                bool((item_logits.argmax(-1) == labels).all())
            )
            result["non_context_logits"].append(item_logits)
        return result

    def get_image_words(self) -> int:
        return self.image_words

    def get_quant_blocklist(self) -> list[str]:
        if self.llama_type.startswith("llama_ens5"):
            return list(ens5_mod.quant_blocklist())
        return []

    def get_trainable_params(self):
        if self.llama_type.startswith("llama_ens5"):
            return ens5_mod.trainable_mask(self.params)
        return jax.tree_util.tree_map(lambda _: True, self.params)


def _import_ens5_extras(sd) -> dict:
    """Projector / image-tag weights from a consolidated ens5 state dict
    (llama_ens5.py:325-339 module names)."""
    out: dict = {}
    def has(k):
        return k in sd

    for name in ("qformer_proj", "visual_proj"):
        wk = f"llma.{name}.0.weight"
        if has(wk):
            out[name] = {
                "linear": {
                    "weight": np.asarray(sd[wk]).T,
                    "bias": np.asarray(sd[f"llma.{name}.0.bias"]),
                },
                "ln": {
                    "weight": np.asarray(sd[f"llma.{name}.1.weight"]),
                    "bias": np.asarray(sd[f"llma.{name}.1.bias"]),
                },
            }
    for tag in ("start_img", "end_img", "start_depth_img", "end_depth_img"):
        if has(f"llma.{tag}"):
            out[tag] = np.asarray(sd[f"llma.{tag}"])
    return out
