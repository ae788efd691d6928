"""Static model architecture description.

The analogue of the reference's declarative ``model_config.json`` registry
(consumed by owq/utils/misc.py:96-140), extended to fully describe the
forward pass since we implement the models ourselves rather than borrowing
HuggingFace modules.  One generic decoder (models/transformer.py) covers the
reference's supported families: OPT (incl. the 350m projection special
case), LLaMA-1/2/vicuna (incl. GQA), BLOOM (alibi), Falcon (parallel block,
multi-query) — family selection by substring match on the model name, like
the reference (owq/utils/misc.py:103-121).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

__all__ = ["ModelConfig", "ARCH_REGISTRY", "arch_for_model", "config_from_hf",
           "freeze_rope_scaling"]


def freeze_rope_scaling(d: Optional[Dict[str, Any]]
                        ) -> Optional[Tuple[Tuple[str, Any], ...]]:
    """HF rope_scaling dict -> hashable sorted tuple (lists become tuples)."""
    if not d:
        return None
    out = []
    for k in sorted(d):
        v = d[k]
        if isinstance(v, list):
            v = tuple(float(x) for x in v)
        out.append((k, v))
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    family: str                     # opt | llama | bloom | falcon
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    max_position_embeddings: int
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = True
    activation: str = "silu"        # relu | gelu | silu
    # OPT specifics
    word_embed_proj_dim: Optional[int] = None   # != hidden -> project_in/out
    do_layer_norm_before: bool = True
    # Family structure flags
    pos_embedding: str = "rope"     # rope | learned | alibi
    norm_type: str = "rmsnorm"      # rmsnorm | layernorm | rmsnorm1p (gemma)
    parallel_block: bool = False    # falcon: attn + mlp share one LN
    parallel_dual_norm: bool = False  # neox: parallel block, mlp has own LN
    fused_qkv: bool = False         # bloom/falcon fused query_key_value
    attn_bias: bool = False
    mlp_bias: bool = False
    gated_mlp: bool = True          # llama SwiGLU vs plain 2-layer MLP
    sliding_window: Optional[int] = None  # mistral/qwen2 local attention
    rotary_pct: float = 1.0         # neox partial rotary (fraction of hd)
    rotary_dim: Optional[int] = None  # gptj: absolute rotary dims override
    rope_style: str = "half"        # half (llama/neox) | interleaved (gptj)
    # RoPE scaling (llama-3.1 / CodeLlama / long-context checkpoints):
    # HF's config.rope_scaling dict frozen into a hashable tuple of
    # (key, value) pairs so ModelConfig stays usable as a cache key.
    # Supported rope_type values: linear, dynamic, yarn, llama3, longrope.
    rope_scaling: Optional[Tuple[Tuple[str, Any], ...]] = None
    pos_offset: int = 0             # opt learned-position offset (+2)
    embed_scale: Optional[float] = None   # gemma sqrt(hidden) embed scaling
    alibi_scheme: str = "bloom"     # bloom | mpt slope schedule
    qkv_clip: Optional[float] = None  # mpt/olmo clip_qkv: clamp q/k/v outputs
    conv1d_weights: bool = False    # gpt2 Conv1D [in,out] vs Linear [out,in]
    # qk normalization before rope: 'head' = per-head rmsnorm over head_dim
    # (qwen3), 'proj' = rmsnorm over the whole q/k projection (olmo2),
    # 'head_ln' = per-head mean-centering layernorm over head_dim (cohere
    # per-head weights / persimmon shared weights + bias), 'head_post' =
    # per-head rmsnorm applied AFTER rope (hunyuan), 'l2' = weightless rms
    # after rope on rope layers (llama4)
    qk_norm: Optional[str] = None
    input_norms: bool = True        # olmo2: no pre-attention/pre-mlp norms
    # bitnet (microsoft BitNet b1.58): rmsnorm on the attention context
    # right before o_proj and on act(gate)*up right before down_proj
    sub_norms: bool = False
    branch_norms: bool = False      # gemma2/olmo2: post_ln on branch outputs
    attn_scale_override: Optional[float] = None  # gemma2 query_pre_attn_scalar
    attn_logit_softcap: Optional[float] = None   # gemma2 tanh soft-capping
    final_logit_softcap: Optional[float] = None
    # per-layer attention kinds ('sliding_attention'|'full_attention') for
    # alternating-window models (gemma2); None = uniform cfg.sliding_window
    layer_types: Optional[Tuple[str, ...]] = None
    # per-layer rope on/off (cohere2: rope only on sliding layers; smollm3
    # no_rope_layers); None = rope on every layer
    rope_layers: Optional[Tuple[int, ...]] = None
    # gemma3/olmo3 dual rope: sliding_attention layers use this base
    # frequency WITHOUT rope_scaling; full layers use rope_theta+scaling
    rope_local_theta: Optional[float] = None
    # literal attention scale multiplier (granite attention_multiplier);
    # overrides both head_dim**-0.5 and attn_scale_override when set
    attn_scale: Optional[float] = None
    residual_multiplier: Optional[float] = None  # granite
    logit_scale: Optional[float] = None  # cohere logit_scale / granite 1/logits_scaling
    # Mixture-of-experts (mixtral/deepseek): 0 = dense mlp
    num_experts: int = 0
    num_experts_per_tok: int = 2
    # deepseek MoE structure: dense first-k layers, shared experts always on
    n_shared_experts: int = 0
    first_k_dense: int = 0
    # routing semantics: 'mixtral' = softmax + topk + renorm;
    # 'deepseek_v2' = softmax + optional group-max mask, no renorm;
    # 'deepseek_v3' = sigmoid + correction bias + group-top2sum mask
    # 'gpt_oss' = top-k on raw logits, softmax over the selected values
    # 'phimoe' = sparsemixer inference path (top-1 twice with jitter masks)
    router_kind: str = "mixtral"
    router_jitter: float = 0.01  # phimoe router_jitter_noise
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    router_norm_topk: bool = True
    # expert inner math: 'gated' = act(gate(x)) * up(x); 'gpt_oss' =
    # (clip(up)+1) * clamped-swiglu(gate) with alpha=1.702
    moe_act: str = "gated"
    swiglu_limit: float = 7.0
    attn_sinks: bool = False  # gpt-oss per-head attention-sink logits
    # llama4: routing weight scales the expert INPUT (not its output), some
    # layers are dense (interleave_moe_layer_step), rope layers use chunked
    # attention, and NoPE layers scale q by a log-position temperature
    moe_weight_inputs: bool = False
    moe_dense_layers: bool = False  # union quantizable names incl. dense mlp
    attention_chunk_size: Optional[int] = None
    attn_temperature_tuning: bool = False
    temp_tuning_floor: float = 8192.0
    temp_tuning_scale: float = 0.1
    # MLA (deepseek v2/v3): low-rank q/kv projections; rope on a small
    # per-head slice with one shared (MQA-style) rope key.  head_dim(_override)
    # is the q/k head dim (nope+rope); v_head_dim is the value head dim.
    # hybrid SSM layers (mamba2: bamba / granite-4 hybrid / falcon-h1
    # class); layer_types entries "mamba" select the mixer per layer
    mamba_heads: int = 0
    mamba_head_dim: int = 0
    mamba_d_state: int = 0
    mamba_d_conv: int = 4
    mamba_n_groups: int = 1
    mamba_chunk: int = 256
    mamba_norm_mode: str = "gated_rms"
    mamba_version: int = 2          # 2 = SSD; 1 = selective scan (jamba)
    # zamba2: hybrid layers run a SHARED transformer block as a prefix on
    # concat([x, embeddings]); its output (through a per-layer linear) is
    # added to the mamba input (Zamba2HybridLayer).  The shared weights are
    # materialized per hybrid layer at import with the per-layer LoRA
    # adapters folded in.
    zamba_block: bool = False
    mamba_inner: int = 0            # mamba-1 inner width (expand * hidden)
    mamba_dt_rank: int = 0          # mamba-1 low-rank dt projection
    mamba_bcdt_rms_eps: Optional[float] = None  # falcon-mamba weightless rms
    # gated-delta-net linear attention (qwen3-next "linear_attention"
    # layers): separate k/v head geometry + conv over the raw q|k|v stream
    gdn_k_heads: int = 0
    gdn_v_heads: int = 0
    gdn_k_dim: int = 0
    gdn_v_dim: int = 0
    gdn_conv: int = 4
    gdn_chunk: int = 64
    # minimax lightning (decay linear) attention + deepnorm-style residual
    lightning_block: int = 0        # block size (0 = no lightning layers)
    # lightning head geometry pinned separately from attention num_heads so
    # local_config (TP) can halve attention heads while the replicated
    # lightning mixer keeps its global shape (0 = mirror num_heads/head_dim)
    lightning_heads: int = 0
    lightning_head_dim: int = 0
    shortconv_L: int = 0            # lfm2 gated short-conv kernel length
    # recurrentgemma griffin RG-LRU (0 = no recurrent layers)
    griffin_lru_width: int = 0
    griffin_conv_width: int = 4
    # per-layer (attn_alpha, attn_beta, mlp_alpha, mlp_beta): the residual
    # stream is the NORMED input scaled by alpha, the branch by beta
    layer_alpha_beta: Optional[Tuple[Tuple[float, float, float, float],
                                     ...]] = None
    attn_gate: bool = False  # qwen3-next: q_proj also emits an output gate
    mla: bool = False
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: Optional[int] = None
    # Tensor parallelism: a shard-local config divides head counts but the
    # per-head dim stays global, so it must be pinned explicitly; tp_size
    # records the shard count (ALiBi slopes need the global head count).
    head_dim_override: Optional[int] = None
    tp_size: int = 1

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.hidden_size // self.num_heads

    def mamba_spec(self):
        from .ssm import Mamba1Spec, MambaSpec

        if self.mamba_version == 1:
            return Mamba1Spec(intermediate=self.mamba_inner,
                              d_state=self.mamba_d_state,
                              d_conv=self.mamba_d_conv,
                              dt_rank=self.mamba_dt_rank,
                              activation=self.activation,
                              bcdt_rms_eps=self.mamba_bcdt_rms_eps)
        return MambaSpec(num_heads=self.mamba_heads,
                         head_dim=self.mamba_head_dim,
                         d_state=self.mamba_d_state,
                         d_conv=self.mamba_d_conv,
                         n_groups=self.mamba_n_groups,
                         chunk_size=self.mamba_chunk,
                         intermediate=self.mamba_heads * self.mamba_head_dim,
                         # zamba2's mixer is always silu even though the
                         # shared-block MLP uses cfg.activation (gelu)
                         activation=("silu" if self.zamba_block
                                     else self.activation),
                         norm_mode=self.mamba_norm_mode)

    @property
    def has_mamba(self) -> bool:
        return bool(self.layer_types) and any(
            "mamba" in t for t in self.layer_types)

    @property
    def has_gdn(self) -> bool:
        return (self.gdn_k_heads > 0 and bool(self.layer_types)
                and "linear_attention" in self.layer_types)

    @property
    def has_lightning(self) -> bool:
        return self.lightning_block > 0

    @property
    def has_shortconv(self) -> bool:
        return self.shortconv_L > 0

    @property
    def has_griffin(self) -> bool:
        return self.griffin_lru_width > 0

    def griffin_spec(self):
        from .griffin import GriffinSpec

        return GriffinSpec(lru_width=self.griffin_lru_width,
                           num_heads=self.num_heads,
                           conv_width=self.griffin_conv_width,
                           activation=self.activation)

    def lightning_spec(self):
        from .lightning import LightningSpec

        return LightningSpec(num_heads=self.lightning_heads or self.num_heads,
                             head_dim=self.lightning_head_dim or self.head_dim,
                             block_size=self.lightning_block,
                             activation=self.activation)

    def gdn_spec(self):
        from .gdn import GDNSpec

        return GDNSpec(num_k_heads=self.gdn_k_heads,
                       num_v_heads=self.gdn_v_heads,
                       head_k_dim=self.gdn_k_dim, head_v_dim=self.gdn_v_dim,
                       d_conv=self.gdn_conv, chunk_size=self.gdn_chunk,
                       activation=self.activation)

    @property
    def v_dim(self) -> int:
        """Value head dim (== head_dim except MLA, where k is nope+rope)."""
        return self.v_head_dim or self.head_dim

    @property
    def embed_dim(self) -> int:
        return self.word_embed_proj_dim or self.hidden_size


# ---------------------------------------------------------------------------
# Quantization-facing architecture metadata: which linears exist per block,
# their CLI aliases, outlier budget ratios, and true-sequential grouping.
# Mirrors model_config.json:2-97 of the reference.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ArchSpec:
    family: str
    map_layer: Dict[str, str]
    ratios: Dict[str, float]
    sequential: Tuple[Tuple[str, ...], ...]


ARCH_REGISTRY: Dict[str, ArchSpec] = {
    "opt": ArchSpec(
        family="opt",
        map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v",
                   "out": "attn.o", "fc1": "mlp.fc1", "fc2": "mlp.fc2"},
        ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
                "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.q", "attn.k", "attn.v"), ("attn.o",),
                    ("mlp.fc1",), ("mlp.fc2",)),
    ),
    "llama": ArchSpec(
        family="llama",
        map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v",
                   "o": "attn.o", "up": "mlp.up", "gate": "mlp.gate",
                   "down": "mlp.down"},
        ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
                "mlp.up": 0.375, "mlp.gate": 0.375, "mlp.down": 0.375},
        sequential=(("attn.q", "attn.k", "attn.v"), ("attn.o",),
                    ("mlp.up", "mlp.gate"), ("mlp.down",)),
    ),
    "bloom": ArchSpec(
        family="bloom",
        map_layer={"qkv": "attn.qkv", "dense": "attn.o",
                   "fc1": "mlp.fc1", "fc2": "mlp.fc2"},
        ratios={"attn.qkv": 1.0, "attn.o": 1.0, "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.qkv",), ("attn.o",), ("mlp.fc1",), ("mlp.fc2",)),
    ),
    "falcon": ArchSpec(
        family="falcon",
        map_layer={"qkv": "attn.qkv", "dense": "attn.o",
                   "fc1": "mlp.fc1", "fc2": "mlp.fc2"},
        ratios={"attn.qkv": 1.0, "attn.o": 1.0, "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.qkv",), ("attn.o",), ("mlp.fc1",), ("mlp.fc2",)),
    ),
    # neox/pythia: bloom-shaped linear set (fused qkv, 2-layer MLP)
    "neox": ArchSpec(
        family="neox",
        map_layer={"qkv": "attn.qkv", "dense": "attn.o",
                   "fc1": "mlp.fc1", "fc2": "mlp.fc2"},
        ratios={"attn.qkv": 1.0, "attn.o": 1.0, "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.qkv",), ("attn.o",), ("mlp.fc1",), ("mlp.fc2",)),
    ),
    "gpt2": ArchSpec(
        family="gpt2",
        map_layer={"c_attn": "attn.qkv", "c_proj": "attn.o",
                   "c_fc": "mlp.fc1", "fc2": "mlp.fc2"},
        ratios={"attn.qkv": 1.0, "attn.o": 1.0, "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.qkv",), ("attn.o",), ("mlp.fc1",), ("mlp.fc2",)),
    ),
    "gpt_neo": ArchSpec(
        family="gpt_neo",
        map_layer={"q_proj": "attn.q", "k_proj": "attn.k",
                   "v_proj": "attn.v", "out_proj": "attn.o",
                   "c_fc": "mlp.fc1", "c_proj": "mlp.fc2"},
        ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
                "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.q", "attn.k", "attn.v"), ("attn.o",),
                    ("mlp.fc1",), ("mlp.fc2",)),
    ),
    "codegen": ArchSpec(
        family="codegen",
        map_layer={"qkv_proj": "attn.qkv", "out_proj": "attn.o",
                   "fc_in": "mlp.fc1", "fc_out": "mlp.fc2"},
        ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
                "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.q", "attn.k", "attn.v"), ("attn.o",),
                    ("mlp.fc1",), ("mlp.fc2",)),
    ),
    "recurrent_gemma": ArchSpec(
        family="recurrent_gemma",
        map_layer={"q_proj": "attn.q", "k_proj": "attn.k",
                   "v_proj": "attn.v", "o_proj": "attn.o",
                   "linear_y": "griffin.y", "linear_x": "griffin.x",
                   "linear_out": "griffin.out", "gate_proj": "mlp.gate",
                   "up_proj": "mlp.up", "down_proj": "mlp.down"},
        ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
                "griffin.y": 1.0, "griffin.x": 1.0, "griffin.out": 1.0,
                "mlp.gate": 0.375, "mlp.up": 0.375, "mlp.down": 0.375},
        sequential=(("attn.q", "attn.k", "attn.v", "griffin.y",
                     "griffin.x"), ("attn.o", "griffin.out"),
                    ("mlp.gate", "mlp.up"), ("mlp.down",)),
    ),
    "gptj": ArchSpec(
        family="gptj",
        map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v",
                   "out": "attn.o", "fc_in": "mlp.fc1", "fc_out": "mlp.fc2"},
        ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
                "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.q", "attn.k", "attn.v"), ("attn.o",),
                    ("mlp.fc1",), ("mlp.fc2",)),
    ),
    # phi-1/1.5/2: gptj-shaped parallel block with separate q/k/v
    "phi": ArchSpec(
        family="phi",
        map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v",
                   "dense": "attn.o", "fc1": "mlp.fc1", "fc2": "mlp.fc2"},
        ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
                "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.q", "attn.k", "attn.v"), ("attn.o",),
                    ("mlp.fc1",), ("mlp.fc2",)),
    ),
    # starcoder2: llama-shaped attention, plain 2-layer MLP (c_fc/c_proj)
    "starcoder2": ArchSpec(
        family="starcoder2",
        map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v",
                   "o": "attn.o", "c_fc": "mlp.fc1", "c_proj": "mlp.fc2"},
        ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
                "mlp.fc1": 0.25, "mlp.fc2": 0.25},
        sequential=(("attn.q", "attn.k", "attn.v"), ("attn.o",),
                    ("mlp.fc1",), ("mlp.fc2",)),
    ),
    # mpt: bloom-shaped linear set (fused Wqkv, 2-layer MLP)
    "mpt": ArchSpec(
        family="mpt",
        map_layer={"Wqkv": "attn.qkv", "out_proj": "attn.o",
                   "up_proj": "mlp.fc1", "down_proj": "mlp.fc2"},
        ratios={"attn.qkv": 1.0, "attn.o": 1.0, "mlp.fc1": 0.25,
                "mlp.fc2": 0.25},
        sequential=(("attn.qkv",), ("attn.o",), ("mlp.fc1",), ("mlp.fc2",)),
    ),
}

# llama-shaped families share the llama quantization spec (same linear set,
# same outlier ratios — the reference's per-family ratios keyed on shape,
# model_config.json:28).
for _alias in ("mistral", "qwen2", "gemma", "mixtral", "phi3", "stablelm",
               "olmo", "cohere", "granite", "glm", "smollm3", "helium",
               "seed_oss", "ernie", "exaone", "olmoe", "hunyuan", "phimoe",
               "granitemoe"):
    ARCH_REGISTRY[_alias] = dataclasses.replace(ARCH_REGISTRY["llama"],
                                                family=_alias)

# granitemoe hybrid checkpoints (granite-4.0) put a mamba2 mixer on most
# layers; include the mixer linears in the spec — sequential-group members
# are intersected with the linears present per block, so plain granitemoe
# is unaffected.
ARCH_REGISTRY["granitemoe"] = dataclasses.replace(
    ARCH_REGISTRY["granitemoe"],
    ratios={**ARCH_REGISTRY["granitemoe"].ratios,
            "mamba.in_proj": 1.0, "mamba.out_proj": 1.0},
    sequential=(("attn.q", "attn.k", "attn.v", "mamba.in_proj"),
                ("attn.o", "mamba.out_proj"), ("mlp.up", "mlp.gate"),
                ("mlp.down",)),
)

# nemotron: llama-shaped attention, plain 2-layer relu² MLP (up/down)
ARCH_REGISTRY["nemotron"] = ArchSpec(
    family="nemotron",
    map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v",
               "o": "attn.o", "up_proj": "mlp.fc1", "down_proj": "mlp.fc2"},
    ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
            "mlp.fc1": 0.25, "mlp.fc2": 0.25},
    sequential=(("attn.q", "attn.k", "attn.v"), ("attn.o",),
                ("mlp.fc1",), ("mlp.fc2",)),
)
# persimmon: neox-shaped linear set (fused query_key_value, 2-layer MLP)
ARCH_REGISTRY["persimmon"] = dataclasses.replace(ARCH_REGISTRY["neox"],
                                                 family="persimmon")
# qwen3_next: llama attention + gdn projections + (moe) gated mlp
ARCH_REGISTRY["qwen3_next"] = ArchSpec(
    family="qwen3_next",
    map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v", "o": "attn.o",
               "in_proj_qkvz": "gdn.in_proj_qkvz",
               "in_proj_ba": "gdn.in_proj_ba", "out_proj": "gdn.out_proj",
               "up": "mlp.up", "gate": "mlp.gate", "down": "mlp.down"},
    ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
            "gdn.in_proj_qkvz": 1.0, "gdn.in_proj_ba": 1.0,
            "gdn.out_proj": 1.0,
            "mlp.up": 0.375, "mlp.gate": 0.375, "mlp.down": 0.375},
    sequential=(("attn.q", "attn.k", "attn.v", "gdn.in_proj_qkvz",
                 "gdn.in_proj_ba"),
                ("attn.o", "gdn.out_proj"), ("mlp.up", "mlp.gate"),
                ("mlp.down",)),
)
# lfm2: llama attention + short-conv projections + gated mlp
ARCH_REGISTRY["lfm2"] = ArchSpec(
    family="lfm2",
    map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v", "o": "attn.o",
               "in_proj": "conv.in_proj", "out_proj": "conv.out_proj",
               "w1": "mlp.gate", "w3": "mlp.up", "w2": "mlp.down"},
    ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
            "conv.in_proj": 1.0, "conv.out_proj": 1.0,
            "mlp.up": 0.375, "mlp.gate": 0.375, "mlp.down": 0.375},
    sequential=(("attn.q", "attn.k", "attn.v", "conv.in_proj"),
                ("attn.o", "conv.out_proj"), ("mlp.up", "mlp.gate"),
                ("mlp.down",)),
)
# minimax: llama attention + lightning projections + moe mlp
ARCH_REGISTRY["minimax"] = ArchSpec(
    family="minimax",
    map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v", "o": "attn.o",
               "qkv_proj": "lightning.qkv_proj",
               "output_gate": "lightning.output_gate",
               "out_proj": "lightning.out_proj",
               "up": "mlp.up", "gate": "mlp.gate", "down": "mlp.down"},
    ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
            "lightning.qkv_proj": 1.0, "lightning.output_gate": 1.0,
            "lightning.out_proj": 1.0,
            "mlp.up": 0.375, "mlp.gate": 0.375, "mlp.down": 0.375},
    sequential=(("attn.q", "attn.k", "attn.v", "lightning.qkv_proj",
                 "lightning.output_gate"),
                ("attn.o", "lightning.out_proj"), ("mlp.up", "mlp.gate"),
                ("mlp.down",)),
)
# jamba: llama attention + mamba-1 projections + gated (moe) mlp
ARCH_REGISTRY["jamba"] = ArchSpec(
    family="jamba",
    map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v", "o": "attn.o",
               "in_proj": "mamba.in_proj", "x_proj": "mamba.x_proj",
               "dt_proj": "mamba.dt_proj", "out_proj": "mamba.out_proj",
               "up": "mlp.up", "gate": "mlp.gate", "down": "mlp.down"},
    ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
            "mamba.in_proj": 1.0, "mamba.x_proj": 1.0, "mamba.dt_proj": 1.0,
            "mamba.out_proj": 1.0,
            "mlp.up": 0.375, "mlp.gate": 0.375, "mlp.down": 0.375},
    sequential=(("attn.q", "attn.k", "attn.v", "mamba.in_proj"),
                ("mamba.x_proj",), ("mamba.dt_proj",),
                ("attn.o", "mamba.out_proj"), ("mlp.up", "mlp.gate"),
                ("mlp.down",)),
)
# bamba: llama attention + mamba in/out projections + gated mlp
ARCH_REGISTRY["bamba"] = ArchSpec(
    family="bamba",
    map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v", "o": "attn.o",
               "in_proj": "mamba.in_proj", "out_proj": "mamba.out_proj",
               "up": "mlp.up", "gate": "mlp.gate", "down": "mlp.down"},
    ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
            "mamba.in_proj": 1.0, "mamba.out_proj": 1.0,
            "mlp.up": 0.375, "mlp.gate": 0.375, "mlp.down": 0.375},
    sequential=(("attn.q", "attn.k", "attn.v", "mamba.in_proj"),
                ("attn.o", "mamba.out_proj"), ("mlp.up", "mlp.gate"),
                ("mlp.down",)),
)
# jetmoe: mixture-of-attention (per-expert q/out pairs + one shared fused
# kv) and MoE MLP, both with jetmoe top-k gating
ARCH_REGISTRY["jetmoe"] = ArchSpec(
    family="jetmoe",
    map_layer={"kv_proj": "attn.kv", "q": "moa.q", "out": "moa.out",
               "gate": "mlp.gate", "up": "mlp.up", "down": "mlp.down"},
    ratios={"attn.kv": 1.0, "moa.q": 1.0, "moa.out": 1.0,
            "mlp.gate": 0.375, "mlp.up": 0.375, "mlp.down": 0.375},
    sequential=(("attn.kv", "moa.q"), ("moa.out",), ("mlp.gate", "mlp.up"),
                ("mlp.down",)),
)
# zamba2: shared-transformer prefix (fused gate_up + per-layer linear) on
# hybrid layers + mamba2 mixer on every layer
ARCH_REGISTRY["zamba2"] = ArchSpec(
    family="zamba2",
    map_layer={"q": "attn.q", "k": "attn.k", "v": "attn.v", "o": "attn.o",
               "in_proj": "mamba.in_proj", "out_proj": "mamba.out_proj",
               "gate_up": "zshared.gateup", "down": "zshared.down",
               "linear": "zshared.proj"},
    ratios={"attn.q": 1.0, "attn.k": 1.0, "attn.v": 1.0, "attn.o": 1.0,
            "mamba.in_proj": 1.0, "mamba.out_proj": 1.0,
            "zshared.gateup": 0.375, "zshared.down": 0.375,
            "zshared.proj": 1.0},
    sequential=(("attn.q", "attn.k", "attn.v", "mamba.in_proj"),
                ("attn.o", "mamba.out_proj"), ("zshared.gateup",),
                ("zshared.down",), ("zshared.proj",)),
)
# llama4: llama-shaped linear set
ARCH_REGISTRY["llama4"] = dataclasses.replace(ARCH_REGISTRY["llama"],
                                              family="llama4")
# dbrx: bloom-shaped fused Wqkv + per-expert gated MLPs
ARCH_REGISTRY["dbrx"] = ArchSpec(
    family="dbrx",
    map_layer={"Wqkv": "attn.qkv", "out_proj": "attn.o",
               "up": "mlp.up", "gate": "mlp.gate", "down": "mlp.down"},
    ratios={"attn.qkv": 1.0, "attn.o": 1.0,
            "mlp.up": 0.375, "mlp.gate": 0.375, "mlp.down": 0.375},
    sequential=(("attn.qkv",), ("attn.o",), ("mlp.up", "mlp.gate"),
                ("mlp.down",)),
)
# gpt_oss: llama-shaped attention + per-expert gated MLPs
ARCH_REGISTRY["gpt_oss"] = dataclasses.replace(ARCH_REGISTRY["llama"],
                                               family="gpt_oss")
# deepseek: MLA projections + llama-shaped (shared/routed) expert MLPs
ARCH_REGISTRY["deepseek"] = ArchSpec(
    family="deepseek",
    map_layer={"q": "attn.q", "q_a": "attn.q_a", "q_b": "attn.q_b",
               "kv_a": "attn.kv_a", "kv_b": "attn.kv_b", "o": "attn.o",
               "up": "mlp.up", "gate": "mlp.gate", "down": "mlp.down"},
    ratios={"attn.q": 1.0, "attn.q_a": 1.0, "attn.q_b": 1.0,
            "attn.kv_a": 1.0, "attn.kv_b": 1.0, "attn.o": 1.0,
            "mlp.up": 0.375, "mlp.gate": 0.375, "mlp.down": 0.375},
    sequential=(("attn.q", "attn.q_a", "attn.q_b", "attn.kv_a", "attn.kv_b"),
                ("attn.o",), ("mlp.up", "mlp.gate"), ("mlp.down",)),
)


def arch_for_model(model_name: str) -> ArchSpec:
    """Family by substring match, like the reference (misc.py:103-121)."""
    name = model_name.lower()
    if "xglm" in name or "biogpt" in name:  # opt-shaped pre-LN decoders
        return ARCH_REGISTRY["opt"]
    if "opt" in name:
        return ARCH_REGISTRY["opt"]
    if "llama-4" in name or "llama4" in name:
        return ARCH_REGISTRY["llama4"]
    if "llama" in name or "vicuna" in name:
        return ARCH_REGISTRY["llama"]
    if "bitnet" in name:  # llama-shaped linear set with inner sub-norms
        return ARCH_REGISTRY["llama"]
    if "bloom" in name:
        return ARCH_REGISTRY["bloom"]
    if "falcon-h1" in name or "falcon_h1" in name:
        return ARCH_REGISTRY["bamba"]
    if "falcon-mamba" in name or "falcon_mamba" in name:
        return ARCH_REGISTRY["jamba"]
    if "falcon" in name:
        return ARCH_REGISTRY["falcon"]
    if "mixtral" in name:
        return ARCH_REGISTRY["mixtral"]
    if "codestral" in name and "mamba" in name:
        return ARCH_REGISTRY["bamba"]
    if "ministral" in name:
        return ARCH_REGISTRY["mistral"]
    if "mistral" in name or "zephyr" in name:
        return ARCH_REGISTRY["mistral"]
    if "qwen3-next" in name or "qwen3_next" in name:
        return ARCH_REGISTRY["qwen3_next"]
    if "qwen" in name:
        return ARCH_REGISTRY["qwen2"]
    if "recurrentgemma" in name or "recurrent-gemma" in name:
        return ARCH_REGISTRY["recurrent_gemma"]
    if "gemma" in name:
        return ARCH_REGISTRY["gemma"]
    if "neox" in name or "pythia" in name:
        return ARCH_REGISTRY["neox"]
    if "gpt-neo" in name or "gptneo" in name or "gpt_neo" in name:
        return ARCH_REGISTRY["gpt_neo"]
    if "codegen" in name:
        return ARCH_REGISTRY["codegen"]
    if "phimoe" in name or "phi-3.5-moe" in name.lower():
        return ARCH_REGISTRY["phimoe"]
    if "phi-3" in name or "phi3" in name:
        return ARCH_REGISTRY["phi3"]
    if "phi" in name:
        return ARCH_REGISTRY["phi"]
    if "stablelm" in name:
        return ARCH_REGISTRY["stablelm"]
    if "mpt" in name:
        return ARCH_REGISTRY["mpt"]
    if "starcoder2" in name:
        return ARCH_REGISTRY["starcoder2"]
    if "starcoder" in name or "santacoder" in name or "bigcode" in name:
        return ARCH_REGISTRY["gpt2"]
    if "flexolmo" in name or "flex-olmo" in name or "flex_olmo" in name:
        return ARCH_REGISTRY["olmoe"]
    if "olmoe" in name:
        return ARCH_REGISTRY["olmoe"]
    if "olmo" in name:
        return ARCH_REGISTRY["olmo"]
    if "cohere" in name or "command" in name or "c4ai" in name or "aya" in name:
        return ARCH_REGISTRY["cohere"]
    if "granite" in name and "moe" in name:
        return ARCH_REGISTRY["granitemoe"]
    if "granite" in name:
        return ARCH_REGISTRY["granite"]
    if "nemotron" in name or "minitron" in name:
        return ARCH_REGISTRY["nemotron"]
    if "persimmon" in name or "fuyu" in name:
        return ARCH_REGISTRY["persimmon"]
    if "smollm3" in name:
        return ARCH_REGISTRY["smollm3"]
    if "dots" in name:  # dots.llm1: llama-shaped linear set
        return ARCH_REGISTRY["llama"]
    if "deepseek" in name:
        return ARCH_REGISTRY["deepseek"]
    if "gpt-oss" in name or "gpt_oss" in name:
        return ARCH_REGISTRY["gpt_oss"]
    if "helium" in name:
        return ARCH_REGISTRY["helium"]
    if "arcee" in name or "afm" in name:
        return ARCH_REGISTRY["nemotron"]
    if "seed-oss" in name or "seed_oss" in name:
        return ARCH_REGISTRY["seed_oss"]
    if "ernie" in name:
        return ARCH_REGISTRY["ernie"]
    if "exaone" in name:
        return ARCH_REGISTRY["exaone"]
    if "hunyuan" in name:
        return ARCH_REGISTRY["hunyuan"]
    if "minimax" in name:
        return ARCH_REGISTRY["minimax"]
    if "lfm2" in name or "lfm-2" in name:
        return ARCH_REGISTRY["lfm2"]
    if "apertus" in name:
        return ARCH_REGISTRY["nemotron"]
    if "jetmoe" in name:
        return ARCH_REGISTRY["jetmoe"]
    if "zamba" in name:
        return ARCH_REGISTRY["zamba2"]
    if "jamba" in name:
        return ARCH_REGISTRY["jamba"]
    if "bamba" in name or "codestral" in name or "mamba2" in name:
        return ARCH_REGISTRY["bamba"]
    if "mamba" in name:  # mamba-1 LMs (incl. falcon-mamba)
        return ARCH_REGISTRY["jamba"]
    if "granite-4" in name or "granite_4" in name:
        return ARCH_REGISTRY["bamba"]
    if "dbrx" in name:
        return ARCH_REGISTRY["dbrx"]
    if "glm" in name:
        return ARCH_REGISTRY["glm"]
    if "gpt-j" in name or "gptj" in name:
        return ARCH_REGISTRY["gptj"]
    if "gpt2" in name or "gpt-2" in name:
        return ARCH_REGISTRY["gpt2"]
    raise NotImplementedError(f"{model_name} model family is not implemented.")


def config_from_hf(hf_config: Any) -> ModelConfig:
    """Translate a HuggingFace config object into a ModelConfig."""
    mt = hf_config.model_type
    if mt == "opt":
        return ModelConfig(
            family="opt",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.ffn_dim,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=1e-5,
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.activation_function,
            word_embed_proj_dim=getattr(hf_config, "word_embed_proj_dim",
                                        hf_config.hidden_size),
            do_layer_norm_before=hf_config.do_layer_norm_before,
            pos_embedding="learned",
            pos_offset=2,  # HF OPTLearnedPositionalEmbedding
            norm_type="layernorm",
            attn_bias=getattr(hf_config, "enable_bias", True),
            mlp_bias=True,
            gated_mlp=False,
        )
    if mt == "xglm":
        # fairseq-style multilingual GPT: tensor2tensor SINUSOIDAL positions
        # (offset 2, table synthesized at import — the HF buffer is
        # non-persistent), sqrt(d_model) embed scale, pre-LN opt block
        return ModelConfig(
            family="opt",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.d_model,
            intermediate_size=hf_config.ffn_dim,
            num_layers=hf_config.num_layers,
            num_heads=hf_config.attention_heads,
            num_kv_heads=hf_config.attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=1e-5,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        True),
            activation=hf_config.activation_function,
            embed_scale=(float(hf_config.d_model) ** 0.5
                         if hf_config.scale_embedding else None),
            pos_embedding="learned",
            pos_offset=2,  # XGLMSinusoidalPositionalEmbedding offset
            norm_type="layernorm",
            attn_bias=True,
            mlp_bias=True,
            gated_mlp=False,
        )
    if mt == "biogpt":
        # OPT-style pre-LN block; learned positions (offset 2) and a
        # sqrt(hidden) embed scale; LayerNorms use the torch default eps
        # (the config's layer_norm_eps is never forwarded by HF)
        return ModelConfig(
            family="opt",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=1e-5,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        True),
            activation=hf_config.hidden_act,
            embed_scale=(float(hf_config.hidden_size) ** 0.5
                         if hf_config.scale_embedding else None),
            pos_embedding="learned",
            pos_offset=2,  # BioGptLearnedPositionalEmbedding
            norm_type="layernorm",
            attn_bias=True,
            mlp_bias=True,
            gated_mlp=False,
        )
    if mt == "llama":
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
        )
    if mt == "bitnet":
        # BitNet b1.58 2B4T: llama block with two extra "sub" rmsnorms —
        # attn_sub_norm on the attention context feeding o_proj and
        # ffn_sub_norm on relu2(gate)*up feeding down_proj (the HF bf16
        # master-weight checkpoint; ternary quantization of the weights is
        # the job of THIS framework, not the modeling code)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            attn_bias=getattr(hf_config, "attention_bias", False),
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            sub_norms=True,
        )
    if mt == "bloom":
        return ModelConfig(
            family="bloom",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=4 * hf_config.hidden_size,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            num_kv_heads=hf_config.n_head,
            max_position_embeddings=2048,
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=True,
            activation="gelu",
            pos_embedding="alibi",
            norm_type="layernorm",
            fused_qkv=True,
            attn_bias=True,
            mlp_bias=True,
            gated_mlp=False,
        )
    if mt in ("mistral", "qwen2", "ministral"):
        # llama wiring; mistral adds sliding-window attention, qwen2 adds
        # q/k/v projection biases (picked up from the state dict directly),
        # ministral declares per-layer sliding/full in layer_types.
        window = getattr(hf_config, "sliding_window", None)
        if mt == "qwen2" and not getattr(hf_config, "use_sliding_window", False):
            window = None
        layer_types = (tuple(hf_config.layer_types)
                       if mt == "ministral"
                       and getattr(hf_config, "layer_types", None)
                       else None)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            sliding_window=window,
            layer_types=layer_types,
            head_dim_override=getattr(hf_config, "head_dim", None),
        )
    if mt == "mixtral":
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            sliding_window=getattr(hf_config, "sliding_window", None),
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
        )
    if mt == "qwen3":
        # llama wiring + per-head rms qk-norm before rope
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            qk_norm="head",
            head_dim_override=getattr(hf_config, "head_dim", None),
            sliding_window=(hf_config.sliding_window
                            if getattr(hf_config, "use_sliding_window",
                                       False) else None),
        )
    if mt == "olmo2":
        # no pre-norms; branch outputs normed before the residual add;
        # rms qk-norm over the whole q/k projections
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            qk_norm="proj",
            input_norms=False,
            branch_norms=True,
        )
    if mt in ("gemma3_text", "gemma3"):
        # gemma2 sandwich norms + per-head rmsnorm1p qk-norm, and a DUAL
        # rope: sliding layers use rope_local_base_freq unscaled, full
        # layers rope_theta (+rope_scaling); no logit softcaps
        if mt == "gemma3":  # multimodal wrapper: use the text tower config
            hf_config = hf_config.text_config
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=hf_config.rope_theta,
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            rope_local_theta=hf_config.rope_local_base_freq,
            tie_word_embeddings=True,
            activation=(getattr(hf_config, "hidden_activation", None)
                        or hf_config.hidden_act),
            pos_embedding="rope",
            norm_type="rmsnorm1p",
            gated_mlp=True,
            qk_norm="head",
            head_dim_override=hf_config.head_dim,
            embed_scale=float(hf_config.hidden_size) ** 0.5,
            branch_norms=True,
            attn_scale_override=hf_config.query_pre_attn_scalar,
            attn_bias=getattr(hf_config, "attention_bias", False),
            sliding_window=hf_config.sliding_window,
            layer_types=tuple(hf_config.layer_types),
        )
    if mt == "olmo3":
        # olmo2 (post-only branch norms + whole-projection qk-norm) with
        # alternating sliding windows; rope_scaling (yarn) applies ONLY to
        # full_attention layers — sliding layers keep the default tables
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            rope_local_theta=(getattr(hf_config, "rope_theta", 10000.0)
                              if getattr(hf_config, "rope_scaling", None)
                              else None),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            qk_norm="proj",
            input_norms=False,
            branch_norms=True,
            sliding_window=hf_config.sliding_window,
            layer_types=tuple(hf_config.layer_types),
        )
    if mt == "gpt_neo":
        # alternating global/local(window) attention, learned positions,
        # UNSCALED attention logits (softmax_scale=1.0), bias-less qkv
        return ModelConfig(
            family="gpt_neo",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=(hf_config.intermediate_size
                               or 4 * hf_config.hidden_size),
            num_layers=hf_config.num_layers,
            num_heads=hf_config.num_heads,
            num_kv_heads=hf_config.num_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        True),
            activation=hf_config.activation_function,
            pos_embedding="learned",
            pos_offset=0,
            norm_type="layernorm",
            gated_mlp=False,
            attn_bias=False,
            mlp_bias=True,
            attn_scale=1.0,
            sliding_window=hf_config.window_size,
            layer_types=tuple(
                "sliding_attention" if t == "local" else "full_attention"
                for t in hf_config.attention_layers),
        )
    if mt == "codegen":
        # gptj-style parallel single-LN block; fused qkv_proj in mp_num=4
        # groups of (q|v|k) re-laid to plain q/k/v at import
        return ModelConfig(
            family="codegen",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd,
            intermediate_size=hf_config.n_inner or 4 * hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            num_kv_heads=hf_config.n_head,
            max_position_embeddings=hf_config.n_positions,
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        False),
            activation=hf_config.activation_function,
            pos_embedding="rope",
            rope_style="interleaved",
            rotary_dim=min(hf_config.rotary_dim,
                           hf_config.n_ctx // hf_config.n_head),
            norm_type="layernorm",
            parallel_block=True,
            attn_bias=False,
            mlp_bias=True,
            gated_mlp=False,
        )
    if mt == "recurrent_gemma":
        # griffin: 2 RG-LRU recurrent layers per sliding-window attention
        # layer (block_types cycle); bf16-rounded sqrt(hidden) embed scale,
        # final logit softcap, MLP width = intermediate_size // 2
        import ml_dtypes

        return ModelConfig(
            family="recurrent_gemma",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size // 2,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=hf_config.rope_theta,
            rotary_pct=hf_config.partial_rotary_factor,
            tie_word_embeddings=True,
            activation=hf_config.hidden_activation,
            pos_embedding="rope",
            norm_type="rmsnorm1p",
            gated_mlp=True,
            mlp_bias=True,
            head_dim_override=hf_config.head_dim,
            embed_scale=float(ml_dtypes.bfloat16(
                float(hf_config.hidden_size) ** 0.5)),
            final_logit_softcap=hf_config.logits_soft_cap,
            sliding_window=hf_config.attention_window_size,
            griffin_lru_width=hf_config.lru_width or hf_config.hidden_size,
            griffin_conv_width=hf_config.conv1d_width,
            layer_types=tuple(
                "sliding_attention" if t == "attention" else "recurrent"
                for t in (list(hf_config.block_types) * 100)
                [:hf_config.num_hidden_layers]),
        )
    if mt == "gemma2":
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=True,
            activation=(getattr(hf_config, "hidden_activation", None)
                        or hf_config.hidden_act),
            pos_embedding="rope",
            norm_type="rmsnorm1p",
            gated_mlp=True,
            head_dim_override=hf_config.head_dim,
            embed_scale=float(hf_config.hidden_size) ** 0.5,
            branch_norms=True,  # post-attn/post-ffn sandwich norms
            attn_scale_override=hf_config.query_pre_attn_scalar,
            attn_logit_softcap=hf_config.attn_logit_softcapping,
            final_logit_softcap=hf_config.final_logit_softcapping,
            sliding_window=hf_config.sliding_window,
            layer_types=tuple(
                getattr(hf_config, "layer_types", None)
                or ("sliding_attention" if i % 2 == 0 else "full_attention"
                    for i in range(hf_config.num_hidden_layers))),
        )
    if mt == "vaultgemma":
        # gemma2 wiring (rmsnorm1p, softcaps, query_pre_attn_scalar,
        # alternating sliding windows) but PRE-norms only: input_layernorm
        # + pre_feedforward_layernorm, no post-branch sandwich norms
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=True,
            activation=(getattr(hf_config, "hidden_activation", None)
                        or hf_config.hidden_act),
            pos_embedding="rope",
            norm_type="rmsnorm1p",
            gated_mlp=True,
            head_dim_override=hf_config.head_dim,
            embed_scale=float(hf_config.hidden_size) ** 0.5,
            attn_scale_override=hf_config.query_pre_attn_scalar,
            attn_logit_softcap=hf_config.attn_logit_softcapping,
            final_logit_softcap=hf_config.final_logit_softcapping,
            sliding_window=hf_config.sliding_window,
            layer_types=tuple(hf_config.layer_types),
        )
    if mt == "gemma":
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=True,
            activation=(getattr(hf_config, "hidden_activation", None)
                        or hf_config.hidden_act),
            pos_embedding="rope",
            norm_type="rmsnorm1p",
            gated_mlp=True,
            head_dim_override=hf_config.head_dim,
            embed_scale=float(hf_config.hidden_size) ** 0.5,
        )
    if mt == "gpt2":
        return ModelConfig(
            family="gpt2",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd,
            intermediate_size=hf_config.n_inner or 4 * hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            num_kv_heads=hf_config.n_head,
            max_position_embeddings=hf_config.n_positions,
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=True,
            activation=hf_config.activation_function,
            pos_embedding="learned",
            pos_offset=0,
            norm_type="layernorm",
            fused_qkv=True,
            attn_bias=True,
            mlp_bias=True,
            gated_mlp=False,
            conv1d_weights=True,
        )
    if mt == "gpt_bigcode":
        # starcoder-1/santacoder: gpt2 wiring with MQA and nn.Linear
        # (transposed) weights instead of Conv1D
        return ModelConfig(
            family="gpt2",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd,
            intermediate_size=hf_config.n_inner or 4 * hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            num_kv_heads=1 if hf_config.multi_query else hf_config.n_head,
            max_position_embeddings=hf_config.n_positions,
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=True,
            activation=hf_config.activation_function,
            pos_embedding="learned",
            pos_offset=0,
            norm_type="layernorm",
            fused_qkv=True,
            attn_bias=True,
            mlp_bias=True,
            gated_mlp=False,
            conv1d_weights=False,
        )
    if mt == "starcoder2":
        return ModelConfig(
            family="starcoder2",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.norm_epsilon,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="layernorm",
            attn_bias=hf_config.use_bias,
            mlp_bias=hf_config.use_bias,
            gated_mlp=False,
            sliding_window=getattr(hf_config, "sliding_window", None),
        )
    if mt == "olmo":
        return ModelConfig(
            family="olmo",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=1e-5,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="layernorm_np",  # non-parametric LN (no scale/bias)
            qkv_clip=getattr(hf_config, "clip_qkv", None),
            attn_bias=getattr(hf_config, "attention_bias", False),
            gated_mlp=True,
        )
    if mt == "gptj":
        return ModelConfig(
            family="gptj",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd,
            intermediate_size=hf_config.n_inner or 4 * hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            num_kv_heads=hf_config.n_head,
            max_position_embeddings=hf_config.n_positions,
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        False),
            activation=hf_config.activation_function,
            pos_embedding="rope",
            rope_style="interleaved",
            rotary_dim=hf_config.rotary_dim,
            norm_type="layernorm",
            parallel_block=True,
            attn_bias=False,
            mlp_bias=True,
            gated_mlp=False,
        )
    if mt == "gpt_neox":
        return ModelConfig(
            family="neox",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.layer_norm_eps,
            rope_theta=getattr(hf_config, "rotary_emb_base", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="layernorm",
            parallel_block=hf_config.use_parallel_residual,
            parallel_dual_norm=hf_config.use_parallel_residual,
            fused_qkv=True,
            attn_bias=getattr(hf_config, "attention_bias", True),
            mlp_bias=True,
            gated_mlp=False,
            rotary_pct=getattr(hf_config, "rotary_pct", 1.0),
        )
    if mt == "phi":
        # phi-1/1.5/2: falcon-style parallel block (mlp reads the attn LN
        # output), separate biased q/k/v, partial rotary, biased lm_head
        if getattr(hf_config, "qk_layernorm", False):
            raise NotImplementedError("phi qk_layernorm is not supported")
        return ModelConfig(
            family="phi",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads", None)
            or hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.layer_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        False),
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rotary_pct=getattr(hf_config, "partial_rotary_factor", 0.5),
            norm_type="layernorm",
            parallel_block=True,
            attn_bias=True,
            mlp_bias=True,
            gated_mlp=False,
        )
    if mt == "phi3":
        # phi-3/3.5: llama wiring once the fused qkv_proj / gate_up_proj are
        # split at import time (hf_import handles the split); longrope
        # scaling reads original_max_position_embeddings from the config
        sc = getattr(hf_config, "rope_scaling", None)
        if sc and "original_max_position_embeddings" not in sc:
            sc = dict(sc)
            sc["original_max_position_embeddings"] = getattr(
                hf_config, "original_max_position_embeddings",
                hf_config.max_position_embeddings)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(sc),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            sliding_window=getattr(hf_config, "sliding_window", None),
        )
    if mt == "stablelm":
        if getattr(hf_config, "use_parallel_residual", False):
            raise NotImplementedError(
                "stablelm use_parallel_residual is not supported")
        if getattr(hf_config, "qk_layernorm", False):
            raise NotImplementedError(
                "stablelm qk_layernorm is not supported")
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.layer_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rotary_pct=getattr(hf_config, "partial_rotary_factor", 0.25),
            norm_type="layernorm",
            gated_mlp=True,
        )
    if mt in ("cohere", "cohere2"):
        # command-r: parallel block (attn+mlp share one mean-centering LN,
        # no bias), interleaved rope, logit_scale on the lm head; cohere-1
        # optionally per-head LN on q/k; cohere2 applies rope only on
        # sliding-window layers (full-attention layers are NoPE)
        layer_types = None
        rope_layers = None
        window = getattr(hf_config, "sliding_window", None)
        if mt == "cohere2":
            layer_types = tuple(hf_config.layer_types)
            rope_layers = tuple(int(t == "sliding_attention")
                                for t in layer_types)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.layer_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_style="interleaved",
            norm_type="layernorm",
            parallel_block=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            gated_mlp=True,
            qk_norm=("head_ln" if getattr(hf_config, "use_qk_norm", False)
                     else None),
            logit_scale=hf_config.logit_scale,
            sliding_window=window if mt == "cohere2" else None,
            layer_types=layer_types,
            rope_layers=rope_layers,
            head_dim_override=getattr(hf_config, "head_dim", None),
        )
    if mt == "granite":
        # llama wiring + the four muP-style scalar multipliers
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            embed_scale=hf_config.embedding_multiplier,
            attn_scale=hf_config.attention_multiplier,
            residual_multiplier=hf_config.residual_multiplier,
            logit_scale=1.0 / hf_config.logits_scaling,
        )
    if mt == "smollm3":
        # llama wiring; config.no_rope_layers[i] is truthy when layer i DOES
        # apply rope (HF: `use_rope = config.no_rope_layers[layer_idx]`)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            rope_layers=tuple(int(bool(u)) for u in hf_config.no_rope_layers),
            sliding_window=(hf_config.sliding_window
                            if getattr(hf_config, "use_sliding_window", False)
                            else None),
            layer_types=(tuple(hf_config.layer_types)
                         if getattr(hf_config, "use_sliding_window", False)
                         else None),
        )
    if mt == "ernie4_5_moe":
        # ernie dense wiring (biased linears, interleaved rope) + MoE:
        # softmax scores, selection on bias-corrected scores, clamp-renorm,
        # ungated shared experts, dense layers below moe_layer_start_index
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_style="interleaved",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "use_bias", False),
            mlp_bias=getattr(hf_config, "use_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
            num_experts=hf_config.moe_num_experts,
            num_experts_per_tok=hf_config.moe_k,
            n_shared_experts=getattr(hf_config, "moe_num_shared_experts", 0),
            first_k_dense=getattr(hf_config, "moe_layer_start_index", 0),
            router_kind="ernie",  # softmax + bias-corrected selection
            router_norm_topk=True,
        )
    if mt in ("glm", "glm4"):
        # llama wiring + fused gate_up (split at import), qkv biases,
        # interleaved partial rotary; glm4 adds gemma2-style sandwich norms
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_style="interleaved",
            rotary_pct=getattr(hf_config, "partial_rotary_factor", 0.5),
            norm_type="rmsnorm",
            gated_mlp=True,
            head_dim_override=getattr(hf_config, "head_dim", None),
            branch_norms=(mt == "glm4"),
        )
    if mt == "nemotron":
        # llama-shaped attention + plain relu² MLP + layernorm1p (weight+1)
        return ModelConfig(
            family="nemotron",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rotary_pct=getattr(hf_config, "partial_rotary_factor", 0.5),
            norm_type="layernorm1p",
            attn_bias=getattr(hf_config, "attention_bias", False),
            mlp_bias=getattr(hf_config, "mlp_bias", False),
            gated_mlp=False,
        )
    if mt == "persimmon":
        # neox-shaped fused qkv + per-head LN on q/k (with bias) + relu² MLP
        return ModelConfig(
            family="persimmon",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.layer_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 25000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        False),
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rotary_pct=getattr(hf_config, "partial_rotary_factor", 0.5),
            norm_type="layernorm",
            fused_qkv=True,
            attn_bias=True,
            mlp_bias=True,
            gated_mlp=False,
            qk_norm=("head_ln" if getattr(hf_config, "qk_layernorm", False)
                     else None),
        )
    if mt == "mpt":
        ac = hf_config.attn_config
        if getattr(ac, "softmax_scale", None):
            raise NotImplementedError("mpt custom softmax_scale")
        if not getattr(ac, "alibi", True):
            raise NotImplementedError("mpt without alibi (learned positions)")
        return ModelConfig(
            family="mpt",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.d_model,
            intermediate_size=hf_config.expansion_ratio * hf_config.d_model,
            num_layers=hf_config.n_layers,
            num_heads=hf_config.n_heads,
            num_kv_heads=hf_config.n_heads,
            max_position_embeddings=hf_config.max_seq_len,
            norm_eps=getattr(hf_config, "layer_norm_epsilon", 1e-5),
            tie_word_embeddings=True,
            activation="gelu",
            pos_embedding="alibi",
            alibi_scheme="mpt",
            qkv_clip=getattr(ac, "clip_qkv", None),
            norm_type="layernorm",
            fused_qkv=True,
            attn_bias=not hf_config.no_bias,
            mlp_bias=not hf_config.no_bias,
            gated_mlp=False,
        )
    if mt == "helium":
        # llama wiring with glm-style interleaved rope pairing
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_style="interleaved",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            mlp_bias=getattr(hf_config, "mlp_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
        )
    if mt == "arcee":
        # llama-shaped attention + plain (non-gated) relu^2 MLP, rmsnorm
        return ModelConfig(
            family="nemotron",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=False,
            attn_bias=getattr(hf_config, "attention_bias", False),
            mlp_bias=getattr(hf_config, "mlp_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
        )
    if mt == "seed_oss":
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", True),
            mlp_bias=getattr(hf_config, "mlp_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
        )
    if mt == "ernie4_5":
        # llama wiring + use_bias on every linear + interleaved rope
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_style="interleaved",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "use_bias", False),
            mlp_bias=getattr(hf_config, "use_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
        )
    if mt == "exaone4":
        # olmo2-style post-only branch norms + per-head rms qk-norm; hybrid
        # attention: rope (and the window) only on sliding layers when a
        # sliding window is configured — full-attention layers are NoPE
        window = getattr(hf_config, "sliding_window", None)
        layer_types = tuple(hf_config.layer_types)
        rope_layers = None
        if window is not None and "full_attention" in layer_types:
            rope_layers = tuple(int(t == "sliding_attention")
                                for t in layer_types)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            qk_norm="head",
            input_norms=False,
            branch_norms=True,
            head_dim_override=getattr(hf_config, "head_dim", None),
            sliding_window=window,
            layer_types=layer_types,
            rope_layers=rope_layers,
        )
    if mt == "olmoe":
        # olmo-style whole-projection rms qk-norm + clip_qkv + mixtral-style
        # MoE with config-driven top-k renorm
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            qk_norm="proj",
            qkv_clip=getattr(hf_config, "clip_qkv", None),
            num_experts=hf_config.num_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            router_kind="mixtral",
            router_norm_topk=hf_config.norm_topk_prob,
        )
    if mt == "dbrx":
        ac, fc = hf_config.attn_config, hf_config.ffn_config
        p_norm = fc.moe_normalize_expert_weights
        if p_norm not in (None, 1, 1.0):
            raise NotImplementedError(
                f"dbrx moe_normalize_expert_weights={p_norm}")
        act = fc.ffn_act_fn.get("name", "silu") if isinstance(
            fc.ffn_act_fn, dict) else "silu"
        return ModelConfig(
            family="dbrx",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.d_model,
            intermediate_size=fc.ffn_hidden_size,
            num_layers=hf_config.n_layers,
            num_heads=hf_config.n_heads,
            num_kv_heads=ac.kv_n_heads,
            max_position_embeddings=hf_config.max_seq_len,
            norm_eps=1e-5,
            rope_theta=ac.rope_theta,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        False),
            activation=act,
            pos_embedding="rope",
            norm_type="layernorm",
            fused_qkv=True,
            qkv_clip=ac.clip_qkv,
            gated_mlp=True,
            num_experts=fc.moe_num_experts,
            num_experts_per_tok=fc.moe_top_k,
            router_kind="mixtral",
            router_norm_topk=p_norm is not None,
        )
    if mt == "qwen3_next":
        # hybrid gated-delta-net linear attention + gated full attention:
        # most layers are GDN mixers; attention layers emit an extra
        # per-head output gate from q_proj and use rms1p qk-norms and
        # partial (0.25) rotary; MoE is qwen2-moe-shaped (sigmoid-gated
        # shared expert)
        return ModelConfig(
            family="qwen3_next",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rotary_pct=getattr(hf_config, "partial_rotary_factor", 0.25),
            norm_type="rmsnorm1p",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
            qk_norm="head",
            attn_gate=True,
            layer_types=tuple(hf_config.layer_types),
            gdn_k_heads=hf_config.linear_num_key_heads,
            gdn_v_heads=hf_config.linear_num_value_heads,
            gdn_k_dim=hf_config.linear_key_head_dim,
            gdn_v_dim=hf_config.linear_value_head_dim,
            gdn_conv=hf_config.linear_conv_kernel_dim,
            num_experts=getattr(hf_config, "num_experts", 0) or 0,
            num_experts_per_tok=getattr(hf_config, "num_experts_per_tok", 0)
            or 0,
            n_shared_experts=(1 if getattr(
                hf_config, "shared_expert_intermediate_size", 0) else 0),
            router_kind="mixtral",
            router_norm_topk=getattr(hf_config, "norm_topk_prob", True),
        )
    if mt == "falcon_h1":
        # every layer runs attention AND a mamba2 mixer in parallel on the
        # same normed input; the zoo of muP multipliers all fold into
        # weights at import (hf_import._fold_falcon_h1), leaving only the
        # embedding and lm-head scalars in the config
        if hf_config.mamba_rms_norm:
            nm = ("grouped_before" if hf_config.mamba_norm_before_gate
                  else "grouped_after")
        else:
            nm = "silu_gate"
        inner = (hf_config.mamba_d_ssm
                 or int(hf_config.mamba_expand * hf_config.hidden_size))
        if inner != hf_config.mamba_n_heads * hf_config.mamba_d_head:
            raise ValueError("falcon-h1 mamba dims inconsistent")
        return ModelConfig(
            family="falcon_h1",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 100000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            mlp_bias=getattr(hf_config, "mlp_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
            embed_scale=hf_config.embedding_multiplier,
            logit_scale=hf_config.lm_head_multiplier,
            layer_types=("mamba_attention",) * hf_config.num_hidden_layers,
            mamba_heads=hf_config.mamba_n_heads,
            mamba_head_dim=hf_config.mamba_d_head,
            mamba_d_state=hf_config.mamba_d_state,
            mamba_d_conv=hf_config.mamba_d_conv,
            mamba_n_groups=hf_config.mamba_n_groups,
            mamba_chunk=hf_config.mamba_chunk_size,
            mamba_norm_mode=nm,
        )
    if mt == "granitemoehybrid":
        # granite-4.0 hybrid: mamba2 layers + (by default NoPE) attention
        # layers, granitemoe fused experts + shared mlp, muP multipliers
        lt = tuple(hf_config.layer_types)
        use_rope = getattr(hf_config, "position_embedding_type",
                           None) == "rope"
        return ModelConfig(
            family="granitemoe_hybrid",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            # NoPE attention by default: rope tables exist but no layer
            # applies them unless position_embedding_type == "rope"
            rope_layers=tuple(int(use_rope and t == "attention")
                              for t in lt),
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            embed_scale=hf_config.embedding_multiplier,
            attn_scale=hf_config.attention_multiplier,
            residual_multiplier=hf_config.residual_multiplier,
            logit_scale=1.0 / hf_config.logits_scaling,
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            n_shared_experts=(1 if getattr(hf_config,
                                           "shared_intermediate_size", 0)
                              else 0),
            router_kind="gpt_oss",
            layer_types=lt,
            mamba_heads=hf_config.mamba_n_heads,
            mamba_head_dim=hf_config.mamba_d_head,
            mamba_d_state=hf_config.mamba_d_state,
            mamba_d_conv=hf_config.mamba_d_conv,
            mamba_n_groups=hf_config.mamba_n_groups,
            mamba_chunk=hf_config.mamba_chunk_size,
        )
    if mt == "jamba":
        # NoPE attention + mamba-1 (selective scan with jamba's dt/b/c rms
        # norms) + mixtral-style MoE without top-k renorm on expert layers
        period, off = hf_config.attn_layer_period, hf_config.attn_layer_offset
        lt = tuple("attention" if (i % period) == off else "mamba"
                   for i in range(hf_config.num_hidden_layers))
        return ModelConfig(
            family="jamba",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",  # jamba attention is NoPE
            rope_layers=(0,) * hf_config.num_hidden_layers,
            norm_type="rmsnorm",
            gated_mlp=True,
            layer_types=lt,
            mamba_version=1,
            mamba_inner=hf_config.mamba_expand * hf_config.hidden_size,
            mamba_d_state=hf_config.mamba_d_state,
            mamba_d_conv=hf_config.mamba_d_conv,
            mamba_dt_rank=hf_config.mamba_dt_rank,
            num_experts=hf_config.num_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            router_kind="mixtral",
            router_norm_topk=False,
        )
    if mt == "lfm2":
        # liquid LFM2: gated short-conv layers (y = out_proj(C*conv(B*x)))
        # alternating with GQA attention (per-head rms qk-norm)
        return ModelConfig(
            family="lfm2",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 1000000.0),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation="silu",
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            qk_norm="head",
            layer_types=tuple(hf_config.layer_types),
            shortconv_L=hf_config.conv_L_cache,
        )
    if mt == "apertus":
        # llama attention + per-head rms qk-norm + non-gated xIELU MLP
        # (learnable alpha_p/alpha_n per layer)
        return ModelConfig(
            family="nemotron",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=False,
            qk_norm="head",
            attn_bias=getattr(hf_config, "attention_bias", False),
            mlp_bias=getattr(hf_config, "mlp_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
        )
    if mt == "minimax":
        # lightning (decay linear) attention on most layers + rope full
        # attention on the rest; deepnorm-style residuals (the normed input
        # is the residual, scaled per layer kind); mixtral-shaped MoE
        lt = tuple(hf_config.layer_types)
        ab = tuple(
            ((hf_config.linear_attn_alpha_factor,
              hf_config.linear_attn_beta_factor,
              hf_config.mlp_alpha_factor, hf_config.mlp_beta_factor)
             if t == "linear_attention" else
             (hf_config.full_attn_alpha_factor,
              hf_config.full_attn_beta_factor,
              hf_config.mlp_alpha_factor, hf_config.mlp_beta_factor))
            for t in lt)
        return ModelConfig(
            family="minimax",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_layers=tuple(int(t == "full_attention") for t in lt),
            norm_type="rmsnorm",
            gated_mlp=True,
            head_dim_override=getattr(hf_config, "head_dim", None),
            sliding_window=getattr(hf_config, "sliding_window", None),
            layer_types=lt,
            lightning_block=hf_config.block_size,
            lightning_heads=hf_config.num_attention_heads,
            lightning_head_dim=(hf_config.hidden_size
                                // hf_config.num_attention_heads),
            layer_alpha_beta=ab,
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            router_kind="mixtral",
            router_norm_topk=True,
        )
    if mt in ("mamba", "falcon_mamba"):
        # pure mamba-1 LMs; falcon-mamba adds WEIGHTLESS rms on dt/B/C
        return ModelConfig(
            family="mamba1",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=1,
            num_kv_heads=1,
            max_position_embeddings=getattr(hf_config,
                                            "max_position_embeddings", 2048),
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",  # tables unused: every layer is a mixer
            rope_layers=(0,) * hf_config.num_hidden_layers,
            norm_type="rmsnorm",
            layer_types=("mamba",) * hf_config.num_hidden_layers,
            mamba_version=1,
            mamba_inner=hf_config.intermediate_size,
            mamba_d_state=hf_config.state_size,
            mamba_d_conv=hf_config.conv_kernel,
            mamba_dt_rank=hf_config.time_step_rank,
            mamba_bcdt_rms_eps=(hf_config.mixer_rms_eps
                                if mt == "falcon_mamba" else None),
        )
    if mt == "mamba2":
        # pure SSD language model (codestral-mamba class): every block is
        # norm -> mamba2 mixer -> residual, no attention, no mlp
        return ModelConfig(
            family="mamba2",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=int(hf_config.expand * hf_config.hidden_size),
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_heads,
            num_kv_heads=hf_config.num_heads,
            max_position_embeddings=getattr(hf_config,
                                            "max_position_embeddings", 2048),
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",  # tables unused: every layer is a mixer
            rope_layers=(0,) * hf_config.num_hidden_layers,
            norm_type="rmsnorm",
            layer_types=("mamba",) * hf_config.num_hidden_layers,
            mamba_heads=hf_config.num_heads,
            mamba_head_dim=hf_config.head_dim,
            mamba_d_state=hf_config.state_size,
            mamba_d_conv=hf_config.conv_kernel,
            mamba_n_groups=hf_config.n_groups,
            mamba_chunk=hf_config.chunk_size,
        )
    if mt == "bamba":
        # hybrid mamba2/attention: most layers are SSD mixers; the few
        # attention layers use partial (0.5) rotary GQA
        lt = tuple(hf_config.layers_block_type)
        return ModelConfig(
            family="bamba",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rotary_pct=getattr(hf_config, "partial_rotary_factor", 0.5),
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            mlp_bias=getattr(hf_config, "mlp_bias", False),
            layer_types=lt,
            mamba_heads=hf_config.mamba_n_heads,
            mamba_head_dim=hf_config.mamba_d_head,
            mamba_d_state=hf_config.mamba_d_state,
            mamba_d_conv=hf_config.mamba_d_conv,
            mamba_n_groups=hf_config.mamba_n_groups,
            mamba_chunk=hf_config.mamba_chunk_size,
        )
    if mt in ("granitemoe", "granitemoeshared"):
        # granite muP multipliers + MoE: top-k on logits then softmax over
        # the selected values (jetmoe gating); fused 3D expert tensors;
        # optional ungated shared mlp (granitemoeshared)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            embed_scale=hf_config.embedding_multiplier,
            attn_scale=hf_config.attention_multiplier,
            residual_multiplier=hf_config.residual_multiplier,
            logit_scale=1.0 / hf_config.logits_scaling,
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            n_shared_experts=(1 if getattr(hf_config,
                                           "shared_intermediate_size", 0)
                              else 0),
            router_kind="gpt_oss",
        )
    if mt in ("hunyuan_v1_dense", "hunyuan_v1_moe"):
        # llama wiring + per-head rms qk-norm applied AFTER rope; the MoE
        # variant adds mixtral-style routing and an ungated shared expert
        kw = {}
        if mt == "hunyuan_v1_moe":
            ne, tk = hf_config.num_experts, hf_config.moe_topk
            if not isinstance(ne, int) or not isinstance(tk, int):
                raise NotImplementedError(
                    "per-layer hunyuan num_experts/moe_topk lists")
            kw = dict(num_experts=ne, num_experts_per_tok=tk,
                      n_shared_experts=1, router_kind="mixtral",
                      router_norm_topk=True)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=(hf_config.intermediate_size
                               if isinstance(hf_config.intermediate_size, int)
                               else hf_config.intermediate_size[0]),
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
            qk_norm="head_post",
            **kw,
        )
    if mt == "phimoe":
        # phi-3.5-MoE: LayerNorm blocks, biased attention, longrope, and the
        # sparsemixer router (deterministic two-pass top-1 at inference)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="layernorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", True),
            sliding_window=getattr(hf_config, "sliding_window", None),
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            router_kind="phimoe",
            router_jitter=getattr(hf_config, "router_jitter_noise", 0.01),
        )
    if mt in ("llama4", "llama4_text"):
        if mt == "llama4":  # composite (vision+text) config: take the text side
            hf_config = hf_config.text_config
        return ModelConfig(
            family="llama4",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_style="interleaved",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            head_dim_override=getattr(hf_config, "head_dim", None),
            qk_norm=("l2" if getattr(hf_config, "use_qk_norm", False)
                     else None),
            rope_layers=tuple(int(bool(u)) for u in hf_config.no_rope_layers),
            layer_types=tuple(hf_config.layer_types),
            attention_chunk_size=getattr(hf_config, "attention_chunk_size",
                                         None),
            attn_temperature_tuning=bool(
                getattr(hf_config, "attn_temperature_tuning", False)),
            temp_tuning_floor=getattr(hf_config, "floor_scale", 8192.0),
            temp_tuning_scale=getattr(hf_config, "attn_scale", 0.1),
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            n_shared_experts=1,
            router_kind="llama4",
            moe_weight_inputs=True,
            moe_dense_layers=getattr(hf_config, "interleave_moe_layer_step",
                                     1) != 1,
        )
    if mt == "gpt_oss":
        return ModelConfig(
            family="gpt_oss",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", True),
            head_dim_override=hf_config.head_dim,
            sliding_window=hf_config.sliding_window,
            layer_types=tuple(hf_config.layer_types),
            attn_sinks=True,
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            router_kind="gpt_oss",
            moe_act="gpt_oss",
            swiglu_limit=getattr(hf_config, "swiglu_limit", 7.0),
        )
    if mt in ("qwen2_moe", "qwen3_moe"):
        # qwen attention (v2: qkv bias; v3: per-head rms qk-norm) + mixtral
        # routing with config-driven renorm; qwen2 adds a sigmoid-gated
        # shared expert.  Sparse/dense layer pattern comes from the state
        # dict (decoder_sparse_step / mlp_only_layers).
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            qk_norm="head" if mt == "qwen3_moe" else None,
            head_dim_override=getattr(hf_config, "head_dim", None),
            sliding_window=(hf_config.sliding_window
                            if getattr(hf_config, "use_sliding_window", False)
                            else None),
            num_experts=hf_config.num_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            n_shared_experts=1 if mt == "qwen2_moe" else 0,
            router_kind="mixtral",
            router_norm_topk=hf_config.norm_topk_prob,
        )
    if mt == "glm4_moe":
        # glm-4.5/4.6: HALF-style partial rotary (unlike glm/glm4's
        # interleaved pairing), optional per-head rms qk-norm, deepseek-v3
        # routing (sigmoid noaux-tc, group top2sum, e_score correction
        # bias), shared experts, dense first-k layers
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_style="half",
            rotary_pct=getattr(hf_config, "partial_rotary_factor", 0.5),
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            qk_norm=("head" if getattr(hf_config, "use_qk_norm", False)
                     else None),
            head_dim_override=getattr(hf_config, "head_dim", None),
            num_experts=hf_config.n_routed_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            n_shared_experts=hf_config.n_shared_experts,
            first_k_dense=hf_config.first_k_dense_replace,
            router_kind="deepseek_v3",
            n_group=hf_config.n_group or 1,
            topk_group=hf_config.topk_group or 1,
            routed_scaling_factor=hf_config.routed_scaling_factor,
            router_norm_topk=hf_config.norm_topk_prob,
        )
    if mt == "jetmoe":
        # JetMoE-8B: sparse MoE in BOTH positions — the MLP and the
        # attention itself (MoA: per-token top-k (q-proj, out-proj) expert
        # pairs over one shared fused kv projection).  num_heads is the
        # kv-head count: queries materialize per expert.
        return ModelConfig(
            family="jetmoe",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_key_value_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.activation_function,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            head_dim_override=hf_config.kv_channels,
            num_experts=hf_config.num_local_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            router_kind="gpt_oss",  # top-k logits, softmax over selected
        )
    if mt == "zamba2":
        # Zyphra Zamba2: every layer is a mamba2 mixer; "hybrid" layers
        # additionally run a SHARED transformer block (attention over
        # concat([x, embeddings]) — in-width 2*hidden, scale
        # (head_dim/2)^-0.5 — then a fused gate|up MLP) whose output goes
        # through a per-layer linear and is added to the mamba input.
        # Shared-block weights are materialized per hybrid layer at import
        # with the per-layer LoRA adapters folded in (exact: the adapters
        # are plain linears), so OWQ quantizes each hybrid layer with its
        # own Hessians.
        L = hf_config.num_hidden_layers
        lt = tuple("hybrid_mamba" if t == "hybrid" else "mamba"
                   for t in hf_config.layers_block_type)
        return ModelConfig(
            family="zamba2",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=L,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        True),
            activation=hf_config.hidden_act,  # shared-block MLP (gelu)
            pos_embedding="rope",
            rope_layers=(None if hf_config.use_mem_rope else (0,) * L),
            norm_type="rmsnorm",
            gated_mlp=True,
            head_dim_override=hf_config.attention_head_dim,
            attn_scale_override=hf_config.attention_head_dim / 2,
            layer_types=lt,
            zamba_block=True,
            mamba_heads=hf_config.n_mamba_heads,
            mamba_head_dim=hf_config.mamba_headdim,
            mamba_d_state=hf_config.mamba_d_state,
            mamba_d_conv=hf_config.mamba_d_conv,
            mamba_n_groups=hf_config.mamba_ngroups,
            mamba_chunk=getattr(hf_config, "chunk_size", 256),
            mamba_norm_mode="grouped_after",
        )
    if mt == "flex_olmo":
        # allenai FlexOlmo: olmo2 block (post-only branch norms,
        # whole-projection qk-norm) with a mixtral-style sparse MoE
        # (softmax over all router logits, top-k, optional renorm)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            qk_norm="proj",
            input_norms=False,
            branch_norms=True,
            num_experts=hf_config.num_experts,
            num_experts_per_tok=hf_config.num_experts_per_tok,
            router_kind="mixtral",
            router_norm_topk=getattr(hf_config, "norm_topk_prob", False),
        )
    if mt == "dots1":
        # rednote dots.llm1: qwen3-style attention (per-head rms qk-norm,
        # full rotary, per-layer sliding/full in layer_types) + deepseek-v3
        # MoE (sigmoid noaux-tc routing with e_score correction bias, group
        # top2sum masking, shared experts, dense first-k layers)
        return ModelConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(
                getattr(hf_config, "rope_scaling", None)),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            qk_norm="head",
            head_dim_override=getattr(hf_config, "head_dim", None),
            sliding_window=hf_config.sliding_window,
            layer_types=(tuple(hf_config.layer_types)
                         if getattr(hf_config, "layer_types", None)
                         else None),
            num_experts=hf_config.n_routed_experts or 0,
            num_experts_per_tok=hf_config.num_experts_per_tok or 2,
            n_shared_experts=hf_config.n_shared_experts or 0,
            first_k_dense=hf_config.first_k_dense_replace,
            router_kind="deepseek_v3",
            n_group=hf_config.n_group or 1,
            topk_group=hf_config.topk_group or 1,
            routed_scaling_factor=hf_config.routed_scaling_factor,
            router_norm_topk=hf_config.norm_topk_prob,
        )
    if mt in ("deepseek_v2", "deepseek_v3"):
        # MLA + shared-expert MoE.  The attention scale is qk_head_dim**-0.5,
        # with the yarn mscale^2 correction folded in for v3 long-context
        # checkpoints (HF DeepseekV3Attention.__init__).
        import math

        qk_head = hf_config.qk_nope_head_dim + hf_config.qk_rope_head_dim
        attn_scale = None
        sc = getattr(hf_config, "rope_scaling", None)
        if mt == "deepseek_v3" and sc is not None:
            mscale_all = sc.get("mscale_all_dim", 0)
            if mscale_all:
                f = sc["factor"]
                ms = (1.0 if f <= 1
                      else 0.1 * mscale_all * math.log(f) + 1.0)
                attn_scale = qk_head ** -0.5 * ms * ms
        if mt == "deepseek_v3":
            style = ("interleaved"
                     if getattr(hf_config, "rope_interleave", True) else "half")
            kind = "deepseek_v3"
            norm_topk = hf_config.norm_topk_prob
            grouped = True
        else:
            style = "interleaved"  # HF v2 applies rope via complex pairs
            kind = "deepseek_v2"
            norm_topk = False  # HF v2 router never renormalizes
            grouped = (getattr(hf_config, "topk_method", "greedy")
                       == "group_limited_greedy")
        return ModelConfig(
            family="deepseek",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(sc),
            tie_word_embeddings=hf_config.tie_word_embeddings,
            activation=hf_config.hidden_act,
            pos_embedding="rope",
            rope_style=style,
            rotary_dim=hf_config.qk_rope_head_dim,
            norm_type="rmsnorm",
            gated_mlp=True,
            attn_bias=getattr(hf_config, "attention_bias", False),
            mla=True,
            q_lora_rank=getattr(hf_config, "q_lora_rank", None),
            kv_lora_rank=hf_config.kv_lora_rank,
            qk_nope_head_dim=hf_config.qk_nope_head_dim,
            qk_rope_head_dim=hf_config.qk_rope_head_dim,
            v_head_dim=hf_config.v_head_dim,
            head_dim_override=qk_head,
            attn_scale=attn_scale,
            num_experts=getattr(hf_config, "n_routed_experts", 0) or 0,
            num_experts_per_tok=getattr(hf_config, "num_experts_per_tok", 0)
            or 0,
            n_shared_experts=getattr(hf_config, "n_shared_experts", 0) or 0,
            first_k_dense=getattr(hf_config, "first_k_dense_replace", 0),
            router_kind=kind,
            n_group=(hf_config.n_group if grouped else 1) or 1,
            topk_group=(hf_config.topk_group if grouped else 1) or 1,
            routed_scaling_factor=getattr(hf_config, "routed_scaling_factor",
                                          1.0),
            router_norm_topk=norm_topk,
        )
    if mt in ("falcon", "RefinedWeb", "RefinedWebModel"):
        n_kv = hf_config.num_attention_heads
        if getattr(hf_config, "multi_query", False):
            n_kv = 1
        if getattr(hf_config, "new_decoder_architecture", False):
            n_kv = getattr(hf_config, "num_kv_heads", n_kv)
        return ModelConfig(
            family="falcon",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=4 * hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=n_kv,
            max_position_embeddings=2048,
            norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=True,
            activation="gelu",
            pos_embedding="rope" if getattr(hf_config, "rotary", True) else "alibi",
            norm_type="layernorm",
            parallel_block=getattr(hf_config, "parallel_attn", True),
            fused_qkv=True,
            attn_bias=getattr(hf_config, "bias", False),
            mlp_bias=getattr(hf_config, "bias", False),
            gated_mlp=False,
        )
    raise NotImplementedError(f"HF model type {mt} is not supported.")
