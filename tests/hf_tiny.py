"""Tiny in-memory HF models for parity tests (no network, random weights)."""

import numpy as np
import torch


def tiny_opt(vocab=97, hidden=32, ffn=64, layers=2, heads=4, max_pos=64,
             word_embed_proj_dim=None, do_layer_norm_before=True, seed=0):
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(seed)
    cfg = OPTConfig(
        vocab_size=vocab, hidden_size=hidden, ffn_dim=ffn,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=max_pos,
        word_embed_proj_dim=word_embed_proj_dim or hidden,
        do_layer_norm_before=do_layer_norm_before,
        activation_function="relu",
    )
    model = OPTForCausalLM(cfg).eval()
    return model


def tiny_llama(vocab=97, hidden=32, inter=56, layers=2, heads=4, kv_heads=2,
               max_pos=64, rope_scaling=None, seed=0):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        rope_scaling=rope_scaling,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(cfg).eval()
    return model


def tiny_bloom(vocab=97, hidden=32, layers=2, heads=4, seed=0):
    from transformers import BloomConfig, BloomForCausalLM

    torch.manual_seed(seed)
    cfg = BloomConfig(
        vocab_size=vocab, hidden_size=hidden, n_layer=layers, n_head=heads,
        attn_implementation="eager",
    )
    model = BloomForCausalLM(cfg).eval()
    return model


def tiny_falcon(vocab=97, hidden=32, layers=2, heads=4, multi_query=True,
                seed=0):
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(seed)
    cfg = FalconConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, multi_query=multi_query,
        parallel_attn=True, bias=False, new_decoder_architecture=False,
        attn_implementation="eager",
    )
    model = FalconForCausalLM(cfg).eval()
    return model


def tiny_mistral(vocab=97, hidden=32, inter=56, layers=2, heads=4, kv_heads=2,
                 max_pos=64, sliding_window=None, seed=0):
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(seed)
    cfg = MistralConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, sliding_window=sliding_window,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = MistralForCausalLM(cfg).eval()
    return model


def tiny_qwen2(vocab=97, hidden=32, inter=56, layers=2, heads=4, kv_heads=2,
               max_pos=64, seed=0):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, use_sliding_window=False,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Qwen2ForCausalLM(cfg).eval()
    return model


def tiny_gemma(vocab=97, hidden=32, inter=56, layers=2, heads=4, kv_heads=2,
               head_dim=16, max_pos=64, seed=0):
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(seed)
    cfg = GemmaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        hidden_activation="gelu_pytorch_tanh",
        attn_implementation="eager",
    )
    model = GemmaForCausalLM(cfg).eval()
    return model


def tiny_neox(vocab=97, hidden=32, inter=64, layers=2, heads=4, max_pos=64,
              rotary_pct=0.25, parallel=True, seed=0):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(seed)
    cfg = GPTNeoXConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=max_pos, rotary_pct=rotary_pct,
        use_parallel_residual=parallel, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = GPTNeoXForCausalLM(cfg).eval()
    return model


def tiny_mixtral(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
                 experts=4, topk=2, max_pos=64, seed=0):
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(seed)
    cfg = MixtralConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        num_local_experts=experts, num_experts_per_tok=topk,
        rms_norm_eps=1e-6, sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = MixtralForCausalLM(cfg).eval()
    return model


def tiny_gpt2(vocab=97, hidden=32, layers=2, heads=4, max_pos=64, seed=0):
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(seed)
    cfg = GPT2Config(
        vocab_size=vocab, n_embd=hidden, n_layer=layers, n_head=heads,
        n_positions=max_pos, attn_implementation="eager",
    )
    model = GPT2LMHeadModel(cfg).eval()
    return model


def tiny_gptj(vocab=97, hidden=32, layers=2, heads=4, rotary_dim=4,
              max_pos=64, seed=0):
    from transformers import GPTJConfig, GPTJForCausalLM

    torch.manual_seed(seed)
    cfg = GPTJConfig(
        vocab_size=vocab, n_embd=hidden, n_layer=layers, n_head=heads,
        rotary_dim=rotary_dim, n_positions=max_pos,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = GPTJForCausalLM(cfg).eval()
    return model


def hf_logits(model, ids: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = model(torch.from_numpy(ids))
    return out.logits.float().numpy()

def tiny_phi(vocab=97, hidden=32, inter=64, layers=2, heads=4, kv_heads=None,
             rotary_pct=0.5, max_pos=64, seed=0):
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(seed)
    cfg = PhiConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        partial_rotary_factor=rotary_pct, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = PhiForCausalLM(cfg).eval()
    return model


def tiny_phi3(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
              max_pos=64, rope_scaling=None, orig_max_pos=None, seed=0):
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(seed)
    kw = {}
    if orig_max_pos is not None:
        kw["original_max_position_embeddings"] = orig_max_pos
    cfg = Phi3Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rope_scaling=rope_scaling, pad_token_id=0,
        tie_word_embeddings=False, attn_implementation="eager", **kw,
    )
    model = Phi3ForCausalLM(cfg).eval()
    return model


def tiny_stablelm(vocab=97, hidden=32, inter=48, layers=2, heads=4,
                  kv_heads=2, rotary_pct=0.25, qkv_bias=False, max_pos=64,
                  seed=0):
    from transformers import StableLmConfig, StableLmForCausalLM

    torch.manual_seed(seed)
    cfg = StableLmConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        partial_rotary_factor=rotary_pct, use_qkv_bias=qkv_bias,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = StableLmForCausalLM(cfg).eval()
    return model


def tiny_mpt(vocab=97, hidden=32, layers=2, heads=4, expansion=2,
             max_pos=64, clip_qkv=None, no_bias=True, seed=0):
    from transformers import MptConfig, MptForCausalLM
    from transformers.models.mpt.configuration_mpt import MptAttentionConfig

    torch.manual_seed(seed)
    cfg = MptConfig(
        vocab_size=vocab, d_model=hidden, n_layers=layers, n_heads=heads,
        expansion_ratio=expansion, max_seq_len=max_pos, no_bias=no_bias,
        attn_config=MptAttentionConfig(alibi=True, clip_qkv=clip_qkv),
        attn_implementation="eager",
    )
    model = MptForCausalLM(cfg).eval()
    return model


def tiny_starcoder2(vocab=97, hidden=32, inter=64, layers=2, heads=4,
                    kv_heads=2, max_pos=64, sliding_window=None, seed=0):
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    torch.manual_seed(seed)
    cfg = Starcoder2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        sliding_window=sliding_window, attn_implementation="eager",
    )
    model = Starcoder2ForCausalLM(cfg).eval()
    return model


def tiny_gpt_bigcode(vocab=97, hidden=32, layers=2, heads=4, max_pos=64,
                     multi_query=True, seed=0):
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(seed)
    cfg = GPTBigCodeConfig(
        vocab_size=vocab, n_embd=hidden, n_layer=layers, n_head=heads,
        n_positions=max_pos, multi_query=multi_query,
        attn_implementation="eager",
    )
    model = GPTBigCodeForCausalLM(cfg).eval()
    return model


def tiny_olmo(vocab=97, hidden=32, inter=64, layers=2, heads=4, kv_heads=2,
              max_pos=64, clip_qkv=None, seed=0):
    from transformers import OlmoConfig, OlmoForCausalLM

    torch.manual_seed(seed)
    cfg = OlmoConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        clip_qkv=clip_qkv, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = OlmoForCausalLM(cfg).eval()
    return model


def tiny_qwen3(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
               head_dim=16, max_pos=64, seed=0):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen3Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    return model


def tiny_gemma2(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
                head_dim=16, max_pos=64, sliding_window=8, seed=0):
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(seed)
    cfg = Gemma2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        sliding_window=sliding_window, query_pre_attn_scalar=24,
        attn_implementation="eager",
    )
    model = Gemma2ForCausalLM(cfg).eval()
    return model


def tiny_olmo2(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
               max_pos=64, seed=0):
    from transformers import Olmo2Config, Olmo2ForCausalLM

    torch.manual_seed(seed)
    cfg = Olmo2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = Olmo2ForCausalLM(cfg).eval()
    return model


def tiny_cohere(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
                max_pos=64, use_qk_norm=False, seed=0):
    from transformers import CohereConfig, CohereForCausalLM

    torch.manual_seed(seed)
    cfg = CohereConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        layer_norm_eps=1e-5, logit_scale=0.0625, use_qk_norm=use_qk_norm,
        attn_implementation="eager",
    )
    model = CohereForCausalLM(cfg).eval()
    return model


def tiny_cohere2(vocab=97, hidden=32, inter=48, layers=4, heads=4, kv_heads=2,
                 max_pos=64, sliding_window=6, pattern=2, seed=0):
    from transformers import Cohere2Config, Cohere2ForCausalLM

    torch.manual_seed(seed)
    cfg = Cohere2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        layer_norm_eps=1e-5, logit_scale=0.0625,
        sliding_window=sliding_window, sliding_window_pattern=pattern,
        attn_implementation="eager",
    )
    model = Cohere2ForCausalLM(cfg).eval()
    return model


def tiny_granite(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
                 max_pos=64, seed=0):
    from transformers import GraniteConfig, GraniteForCausalLM

    torch.manual_seed(seed)
    cfg = GraniteConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        embedding_multiplier=6.0, attention_multiplier=0.015625,
        residual_multiplier=0.22, logits_scaling=8.0,
        attn_implementation="eager",
    )
    model = GraniteForCausalLM(cfg).eval()
    return model


def tiny_nemotron(vocab=97, hidden=32, inter=64, layers=2, heads=4,
                  kv_heads=2, rotary_pct=0.5, max_pos=64, seed=0):
    from transformers import NemotronConfig, NemotronForCausalLM

    torch.manual_seed(seed)
    cfg = NemotronConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        partial_rotary_factor=rotary_pct, norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = NemotronForCausalLM(cfg).eval()
    return model


def tiny_persimmon(vocab=97, hidden=32, inter=64, layers=2, heads=4,
                   rotary_pct=0.5, qk_layernorm=True, max_pos=64, seed=0):
    from transformers import PersimmonConfig, PersimmonForCausalLM

    torch.manual_seed(seed)
    cfg = PersimmonConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=max_pos, partial_rotary_factor=rotary_pct,
        qk_layernorm=qk_layernorm, layer_norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = PersimmonForCausalLM(cfg).eval()
    return model


def tiny_smollm3(vocab=97, hidden=32, inter=48, layers=4, heads=4, kv_heads=2,
                 max_pos=64, rope_interval=2, sliding_window=None, seed=0):
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    torch.manual_seed(seed)
    cfg = SmolLM3Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, no_rope_layer_interval=rope_interval,
        use_sliding_window=sliding_window is not None,
        sliding_window=sliding_window, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    model = SmolLM3ForCausalLM(cfg).eval()
    return model


def tiny_glm(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
             head_dim=None, max_pos=64, v4=False, seed=0):
    from transformers import (Glm4Config, Glm4ForCausalLM, GlmConfig,
                              GlmForCausalLM)

    torch.manual_seed(seed)
    C, M = (Glm4Config, Glm4ForCausalLM) if v4 else (GlmConfig, GlmForCausalLM)
    cfg = C(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim or hidden // heads,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        attention_bias=True, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    model = M(cfg).eval()
    return model


def tiny_deepseek_v3(vocab=97, hidden=32, inter=48, moe_inter=16, layers=3,
                     heads=4, q_lora=24, kv_lora=16, nope=8, rope_dim=4,
                     v_dim=8, experts=8, topk=2, n_group=2, topk_group=1,
                     shared=1, first_dense=1, max_pos=64, interleave=True,
                     seed=0):
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(seed)
    cfg = DeepseekV3Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        moe_intermediate_size=moe_inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=heads,
        q_lora_rank=q_lora, kv_lora_rank=kv_lora, qk_nope_head_dim=nope,
        qk_rope_head_dim=rope_dim, v_head_dim=v_dim,
        n_routed_experts=experts, num_experts_per_tok=topk,
        n_group=n_group, topk_group=topk_group, n_shared_experts=shared,
        first_k_dense_replace=first_dense, routed_scaling_factor=2.5,
        norm_topk_prob=True, max_position_embeddings=max_pos,
        rope_interleave=interleave, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = DeepseekV3ForCausalLM(cfg).eval()
    # the router correction bias initializes to zero; perturb it so the
    # noaux-tc selection path is actually exercised
    with torch.no_grad():
        for layer in model.model.layers[first_dense:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    return model


def tiny_deepseek_v2(vocab=97, hidden=32, inter=48, moe_inter=16, layers=3,
                     heads=4, q_lora=None, kv_lora=16, nope=8, rope_dim=4,
                     v_dim=8, experts=8, topk=2, topk_method="greedy",
                     n_group=None, topk_group=None, shared=1, first_dense=1,
                     max_pos=64, seed=0):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(seed)
    cfg = DeepseekV2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        moe_intermediate_size=moe_inter, num_hidden_layers=layers,
        num_attention_heads=heads, q_lora_rank=q_lora, kv_lora_rank=kv_lora,
        qk_nope_head_dim=nope, qk_rope_head_dim=rope_dim, v_head_dim=v_dim,
        n_routed_experts=experts, num_experts_per_tok=topk,
        topk_method=topk_method, n_group=n_group, topk_group=topk_group,
        n_shared_experts=shared, first_k_dense_replace=first_dense,
        routed_scaling_factor=1.5, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = DeepseekV2ForCausalLM(cfg).eval()
    return model


def tiny_gpt_oss(vocab=97, hidden=32, inter=24, layers=2, heads=4,
                 kv_heads=2, head_dim=8, experts=4, topk=2, max_pos=64,
                 sliding_window=6, rope_scaling=None, seed=0):
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(seed)
    cfg = GptOssConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        num_local_experts=experts, num_experts_per_tok=topk,
        max_position_embeddings=max_pos, sliding_window=sliding_window,
        rope_scaling=rope_scaling, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = GptOssForCausalLM(cfg).eval()
    return model


def tiny_qwen2_moe(vocab=97, hidden=32, inter=48, moe_inter=16,
                   shared_inter=24, layers=2, heads=4, kv_heads=2, experts=4,
                   topk=2, norm_topk=False, max_pos=64, seed=0):
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen2MoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        moe_intermediate_size=moe_inter,
        shared_expert_intermediate_size=shared_inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, num_experts=experts,
        num_experts_per_tok=topk, norm_topk_prob=norm_topk,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Qwen2MoeForCausalLM(cfg).eval()
    return model


def tiny_qwen3_moe(vocab=97, hidden=32, inter=48, moe_inter=16, layers=2,
                   heads=4, kv_heads=2, head_dim=16, experts=4, topk=2,
                   norm_topk=True, max_pos=64, seed=0):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen3MoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        moe_intermediate_size=moe_inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        head_dim=head_dim, num_experts=experts, num_experts_per_tok=topk,
        norm_topk_prob=norm_topk, decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Qwen3MoeForCausalLM(cfg).eval()
    return model


def tiny_glm4_moe(vocab=97, hidden=32, inter=48, moe_inter=16, layers=3,
                  heads=4, kv_heads=2, head_dim=16, experts=8, topk=2,
                  n_group=2, topk_group=1, shared=1, first_dense=1,
                  use_qk_norm=True, max_pos=64, seed=0):
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    torch.manual_seed(seed)
    cfg = Glm4MoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        moe_intermediate_size=moe_inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        head_dim=head_dim, n_routed_experts=experts,
        num_experts_per_tok=topk, n_group=n_group, topk_group=topk_group,
        n_shared_experts=shared, first_k_dense_replace=first_dense,
        routed_scaling_factor=1.8, norm_topk_prob=True,
        use_qk_norm=use_qk_norm, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, attn_implementation="eager",
    )
    model = Glm4MoeForCausalLM(cfg).eval()
    # exercise the noaux-tc bias path (initialized to zero)
    with torch.no_grad():
        for layer in model.model.layers[first_dense:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    return model


def tiny_dbrx(vocab=97, hidden=32, layers=2, heads=4, kv_heads=2, ffn=16,
              experts=4, topk=2, clip_qkv=8.0, max_pos=64, seed=0):
    from transformers import DbrxConfig, DbrxForCausalLM

    torch.manual_seed(seed)
    cfg = DbrxConfig(
        vocab_size=vocab, d_model=hidden, n_layers=layers, n_heads=heads,
        max_seq_len=max_pos,
        attn_config={"kv_n_heads": kv_heads, "clip_qkv": clip_qkv,
                     "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": ffn, "moe_num_experts": experts,
                    "moe_top_k": topk, "moe_normalize_expert_weights": 1.0},
        attn_implementation="eager",
    )
    model = DbrxForCausalLM(cfg).eval()
    return model


def tiny_olmoe(vocab=97, hidden=32, inter=16, layers=2, heads=4, kv_heads=2,
               experts=4, topk=2, norm_topk=False, clip_qkv=None, max_pos=64,
               seed=0):
    from transformers import OlmoeConfig, OlmoeForCausalLM

    torch.manual_seed(seed)
    cfg = OlmoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, num_experts=experts,
        num_experts_per_tok=topk, norm_topk_prob=norm_topk,
        clip_qkv=clip_qkv, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = OlmoeForCausalLM(cfg).eval()
    return model


def tiny_helium(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
                head_dim=8, max_pos=64, seed=0):
    from transformers import HeliumConfig, HeliumForCausalLM

    torch.manual_seed(seed)
    cfg = HeliumConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, attn_implementation="eager",
    )
    model = HeliumForCausalLM(cfg).eval()
    return model


def tiny_arcee(vocab=97, hidden=32, inter=64, layers=2, heads=4, kv_heads=2,
               max_pos=64, seed=0):
    from transformers import ArceeConfig, ArceeForCausalLM

    torch.manual_seed(seed)
    cfg = ArceeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = ArceeForCausalLM(cfg).eval()
    return model


def tiny_seed_oss(vocab=97, hidden=32, inter=48, layers=2, heads=4,
                  kv_heads=2, head_dim=16, max_pos=64, seed=0):
    from transformers import SeedOssConfig, SeedOssForCausalLM

    torch.manual_seed(seed)
    cfg = SeedOssConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = SeedOssForCausalLM(cfg).eval()
    return model


def tiny_ernie45(vocab=97, hidden=32, inter=48, layers=2, heads=4,
                 kv_heads=2, use_bias=True, max_pos=64, seed=0):
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

    torch.manual_seed(seed)
    cfg = Ernie4_5Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, use_bias=use_bias,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, attn_implementation="eager",
    )
    model = Ernie4_5ForCausalLM(cfg).eval()
    return model


def tiny_exaone4(vocab=97, hidden=32, inter=48, layers=4, heads=4,
                 kv_heads=2, head_dim=16, sliding_window=6, pattern=2,
                 max_pos=64, seed=0):
    from transformers import Exaone4Config, Exaone4ForCausalLM

    torch.manual_seed(seed)
    cfg = Exaone4Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        sliding_window=sliding_window, sliding_window_pattern=pattern,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Exaone4ForCausalLM(cfg).eval()
    return model


def tiny_llama4(vocab=97, hidden=32, inter=16, inter_mlp=48, layers=4,
                heads=4, kv_heads=2, head_dim=8, experts=4, topk=2,
                moe_step=2, chunk=8, temp_tuning=True, use_qk_norm=True,
                max_pos=64, seed=0):
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(seed)
    cfg = Llama4TextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        intermediate_size_mlp=inter_mlp, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        head_dim=head_dim, num_local_experts=experts,
        num_experts_per_tok=topk, interleave_moe_layer_step=moe_step,
        attention_chunk_size=chunk, attn_temperature_tuning=temp_tuning,
        floor_scale=4, use_qk_norm=use_qk_norm,
        max_position_embeddings=max_pos, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Llama4ForCausalLM(cfg).eval()
    return model


def tiny_hunyuan_dense(vocab=97, hidden=32, inter=48, layers=2, heads=4,
                       kv_heads=2, head_dim=16, max_pos=64, seed=0):
    from transformers import HunYuanDenseV1Config, HunYuanDenseV1ForCausalLM

    torch.manual_seed(seed)
    cfg = HunYuanDenseV1Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = HunYuanDenseV1ForCausalLM(cfg).eval()
    return model


def tiny_hunyuan_moe(vocab=97, hidden=32, inter=16, layers=2, heads=4,
                     kv_heads=2, head_dim=16, experts=4, topk=2, max_pos=64,
                     seed=0):
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM

    torch.manual_seed(seed)
    cfg = HunYuanMoEV1Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        num_experts=experts, moe_topk=topk,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = HunYuanMoEV1ForCausalLM(cfg).eval()
    return model


def tiny_phimoe(vocab=97, hidden=32, inter=16, layers=2, heads=4, kv_heads=2,
                experts=4, max_pos=64, seed=0):
    from transformers import PhimoeConfig, PhimoeForCausalLM

    torch.manual_seed(seed)
    cfg = PhimoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, num_local_experts=experts,
        num_experts_per_tok=2, max_position_embeddings=max_pos,
        rms_norm_eps=1e-5, sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = PhimoeForCausalLM(cfg).eval()
    return model


def tiny_granitemoe(vocab=97, hidden=32, inter=16, shared_inter=24, layers=2,
                    heads=4, kv_heads=2, experts=4, topk=2, shared=True,
                    max_pos=64, seed=0):
    from transformers import (GraniteMoeConfig, GraniteMoeForCausalLM,
                              GraniteMoeSharedConfig,
                              GraniteMoeSharedForCausalLM)

    torch.manual_seed(seed)
    kw = dict(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, num_local_experts=experts,
        num_experts_per_tok=topk, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        embedding_multiplier=4.0, attention_multiplier=0.03125,
        residual_multiplier=0.3, logits_scaling=5.0,
        attn_implementation="eager",
    )
    if shared:
        cfg = GraniteMoeSharedConfig(shared_intermediate_size=shared_inter,
                                     **kw)
        return GraniteMoeSharedForCausalLM(cfg).eval()
    return GraniteMoeForCausalLM(GraniteMoeConfig(**kw)).eval()


def tiny_bamba(vocab=97, hidden=32, inter=48, layers=3, heads=4, kv_heads=2,
               attn_idx=(1,), m_heads=8, m_head_dim=8, m_state=16, m_conv=4,
               m_groups=2, chunk=8, max_pos=64, seed=0):
    from transformers import BambaConfig, BambaForCausalLM

    torch.manual_seed(seed)
    cfg = BambaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, attn_layer_indices=list(attn_idx),
        mamba_n_heads=m_heads, mamba_d_head=m_head_dim,
        mamba_d_state=m_state, mamba_d_conv=m_conv, mamba_expand=2,
        mamba_n_groups=m_groups, mamba_chunk_size=chunk,
        max_position_embeddings=max_pos, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = BambaForCausalLM(cfg).eval()
    return model


def tiny_granite4(vocab=97, hidden=32, inter=16, shared_inter=24, layers=3,
                  heads=4, kv_heads=2, experts=4, topk=2, m_heads=8,
                  m_head_dim=8, m_state=16, m_groups=2, chunk=8, max_pos=64,
                  rope=False, seed=0):
    from transformers import (GraniteMoeHybridConfig,
                              GraniteMoeHybridForCausalLM)

    torch.manual_seed(seed)
    cfg = GraniteMoeHybridConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        shared_intermediate_size=shared_inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        num_local_experts=experts, num_experts_per_tok=topk,
        layer_types=["mamba", "attention", "mamba"][:layers],
        mamba_n_heads=m_heads, mamba_d_head=m_head_dim,
        mamba_d_state=m_state, mamba_d_conv=4, mamba_expand=2,
        mamba_n_groups=m_groups, mamba_chunk_size=chunk,
        position_embedding_type="rope" if rope else None,
        max_position_embeddings=max_pos, rms_norm_eps=1e-5,
        embedding_multiplier=2.0, attention_multiplier=0.0625,
        residual_multiplier=0.4, logits_scaling=3.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = GraniteMoeHybridForCausalLM(cfg).eval()
    return model


def tiny_falcon_h1(vocab=97, hidden=32, inter=48, layers=2, heads=4,
                   kv_heads=2, m_heads=8, m_head_dim=8, m_state=16,
                   m_groups=2, chunk=8, rms_norm=True, before_gate=True,
                   max_pos=64, seed=0):
    from transformers import FalconH1Config, FalconH1ForCausalLM

    torch.manual_seed(seed)
    cfg = FalconH1Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, mamba_d_ssm=m_heads * m_head_dim,
        mamba_n_heads=m_heads, mamba_d_head=m_head_dim,
        mamba_d_state=m_state, mamba_d_conv=4, mamba_n_groups=m_groups,
        mamba_chunk_size=chunk, max_position_embeddings=max_pos,
        embedding_multiplier=2.0, lm_head_multiplier=0.5,
        attention_in_multiplier=1.5, attention_out_multiplier=0.7,
        ssm_in_multiplier=1.2, ssm_out_multiplier=0.8, key_multiplier=0.9,
        mlp_multipliers=[1.3, 0.6],
        ssm_multipliers=[1.1, 0.9, 1.05, 0.95, 1.2],
        mamba_rms_norm=rms_norm, mamba_norm_before_gate=before_gate,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = FalconH1ForCausalLM(cfg).eval()
    return model


def tiny_qwen3_next(vocab=97, hidden=32, inter=48, layers=4, heads=4,
                    kv_heads=2, head_dim=16, gk_heads=2, gv_heads=4,
                    gk_dim=8, gv_dim=8, experts=4, topk=2, moe_inter=16,
                    shared_inter=24, max_pos=64, seed=0):
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen3NextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        linear_num_key_heads=gk_heads, linear_num_value_heads=gv_heads,
        linear_key_head_dim=gk_dim, linear_value_head_dim=gv_dim,
        linear_conv_kernel_dim=4, num_experts=experts,
        num_experts_per_tok=topk, moe_intermediate_size=moe_inter,
        shared_expert_intermediate_size=shared_inter,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=max_pos, norm_topk_prob=True,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = Qwen3NextForCausalLM(cfg).eval()
    return model


def tiny_mamba2(vocab=97, hidden=32, layers=2, m_heads=8, m_head_dim=8,
                m_state=16, m_groups=2, chunk=8, seed=0):
    from transformers import Mamba2Config, Mamba2ForCausalLM

    torch.manual_seed(seed)
    cfg = Mamba2Config(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_heads=m_heads, head_dim=m_head_dim, state_size=m_state,
        n_groups=m_groups, conv_kernel=4, expand=2, chunk_size=chunk,
        tie_word_embeddings=False,
    )
    model = Mamba2ForCausalLM(cfg).eval()
    return model


def tiny_jamba(vocab=97, hidden=32, inter=48, layers=4, heads=4, kv_heads=2,
               experts=4, topk=2, m_state=16, dt_rank=8, max_pos=64, seed=0):
    from transformers import JambaConfig, JambaForCausalLM

    torch.manual_seed(seed)
    cfg = JambaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, attn_layer_offset=1,
        attn_layer_period=2, expert_layer_offset=1, expert_layer_period=2,
        num_experts=experts, num_experts_per_tok=topk,
        mamba_d_state=m_state, mamba_d_conv=4, mamba_expand=2,
        mamba_dt_rank=dt_rank, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, use_mamba_kernels=False,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = JambaForCausalLM(cfg).eval()
    return model


def tiny_mamba1(vocab=97, hidden=32, layers=2, m_state=16, dt_rank=8,
                falcon=False, seed=0):
    import transformers

    torch.manual_seed(seed)
    if falcon:
        cfg = transformers.FalconMambaConfig(
            vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
            state_size=m_state, conv_kernel=4, expand=2,
            time_step_rank=dt_rank, use_mambapy=False)
        return transformers.FalconMambaForCausalLM(cfg).eval()
    cfg = transformers.MambaConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        state_size=m_state, conv_kernel=4, expand=2, time_step_rank=dt_rank)
    return transformers.MambaForCausalLM(cfg).eval()


def tiny_minimax(vocab=97, hidden=32, inter=16, layers=2, heads=4,
                 kv_heads=2, head_dim=8, block=8, experts=4, topk=2,
                 alphas=None, max_pos=64, seed=0):
    from transformers import MiniMaxConfig, MiniMaxForCausalLM

    torch.manual_seed(seed)
    kw = dict(zip(("linear_attn_alpha_factor", "linear_attn_beta_factor",
                   "full_attn_alpha_factor", "full_attn_beta_factor",
                   "mlp_alpha_factor", "mlp_beta_factor"),
                  alphas or (1, 1, 1, 1, 1, 1)))
    cfg = MiniMaxConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        layer_types=(["linear_attention", "full_attention"]
                     * ((layers + 1) // 2))[:layers],
        block_size=block, num_local_experts=experts,
        num_experts_per_tok=topk, max_position_embeddings=max_pos,
        rms_norm_eps=1e-5, sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager", **kw,
    )
    model = MiniMaxForCausalLM(cfg).eval()
    return model


def tiny_lfm2(vocab=97, hidden=32, inter=48, layers=2, heads=4, kv_heads=2,
              conv_L=3, max_pos=64, seed=0):
    from transformers import Lfm2Config, Lfm2ForCausalLM

    torch.manual_seed(seed)
    cfg = Lfm2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        layer_types=(["conv", "full_attention"] * layers)[:layers],
        conv_L_cache=conv_L, max_position_embeddings=max_pos,
        block_auto_adjust_ff_dim=False, norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Lfm2ForCausalLM(cfg).eval()
    return model


def tiny_apertus(vocab=97, hidden=32, inter=48, layers=2, heads=4,
                 kv_heads=2, max_pos=64, seed=0):
    from transformers import ApertusConfig, ApertusForCausalLM

    torch.manual_seed(seed)
    cfg = ApertusConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, rope_scaling=None, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = ApertusForCausalLM(cfg).eval()
    return model


def tiny_ernie45_moe(vocab=97, hidden=32, inter=48, moe_inter=16, layers=2,
                     heads=4, kv_heads=2, experts=4, topk=2, shared=1,
                     start=1, max_pos=64, seed=0):
    from transformers import Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM

    torch.manual_seed(seed)
    cfg = Ernie4_5_MoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        moe_intermediate_size=moe_inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        moe_num_experts=experts, moe_k=topk, moe_num_shared_experts=shared,
        moe_layer_start_index=start, max_position_embeddings=max_pos,
        use_bias=False, rms_norm_eps=1e-5, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    model = Ernie4_5_MoeForCausalLM(cfg).eval()
    with torch.no_grad():  # exercise the bias-corrected selection path
        for layer in model.model.layers[start:]:
            layer.mlp.moe_statics.e_score_correction_bias.uniform_(-0.2, 0.2)
    return model


def tiny_gemma3(vocab=97, hidden=32, inter=48, layers=4, heads=4, kv_heads=2,
                head_dim=16, max_pos=64, sliding_window=8, seed=0,
                rope_scaling=None):
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    torch.manual_seed(seed)
    cfg = Gemma3TextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        sliding_window=sliding_window, sliding_window_pattern=2,
        query_pre_attn_scalar=24, rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0, rope_scaling=rope_scaling,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    model = Gemma3ForCausalLM(cfg).eval()
    return model


def tiny_olmo3(vocab=97, hidden=32, inter=48, layers=4, heads=4, kv_heads=2,
               max_pos=64, sliding_window=8, seed=0, rope_scaling=None):
    from transformers import Olmo3Config, Olmo3ForCausalLM

    torch.manual_seed(seed)
    cfg = Olmo3Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        sliding_window=sliding_window,
        layer_types=(["sliding_attention", "sliding_attention",
                      "sliding_attention", "full_attention"]
                     * ((layers + 3) // 4))[:layers],
        rope_scaling=rope_scaling,
        attn_implementation="eager",
    )
    model = Olmo3ForCausalLM(cfg).eval()
    return model


def tiny_gpt_neo(vocab=97, hidden=32, layers=4, heads=4, window=8,
                 max_pos=64, seed=0):
    from transformers import GPTNeoConfig, GPTNeoForCausalLM

    torch.manual_seed(seed)
    cfg = GPTNeoConfig(
        vocab_size=vocab, hidden_size=hidden, num_layers=layers,
        num_heads=heads, attention_types=[[["global", "local"], layers // 2]],
        window_size=window, max_position_embeddings=max_pos,
        attn_implementation="eager",
    )
    model = GPTNeoForCausalLM(cfg).eval()
    return model


def tiny_codegen(vocab=97, hidden=32, layers=2, heads=4, rotary_dim=4,
                 max_pos=64, seed=0):
    from transformers import CodeGenConfig, CodeGenForCausalLM

    torch.manual_seed(seed)
    cfg = CodeGenConfig(
        vocab_size=vocab, n_embd=hidden, n_layer=layers, n_head=heads,
        rotary_dim=rotary_dim, n_positions=max_pos, n_ctx=max_pos,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = CodeGenForCausalLM(cfg).eval()
    return model


def tiny_recurrentgemma(vocab=97, hidden=32, inter=96, layers=3, heads=4,
                        kv_heads=2, head_dim=8, lru_width=32, conv_width=4,
                        window=16, max_pos=64, seed=0):
    # NOTE window >= prompt length for HF parity: HF prefill masks purely
    # causally (the window only exists via its rotating decode cache,
    # modeling_recurrent_gemma.py:656-668); we use the paper-faithful
    # sliding mask, identical whenever T <= window.
    from transformers import (RecurrentGemmaConfig,
                              RecurrentGemmaForCausalLM)

    torch.manual_seed(seed)
    cfg = RecurrentGemmaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        lru_width=lru_width, conv1d_width=conv_width,
        attention_window_size=window, max_position_embeddings=max_pos,
        block_types=["recurrent", "recurrent", "attention"],
        logits_soft_cap=30.0, partial_rotary_factor=0.5,
        attn_implementation="eager",
    )
    model = RecurrentGemmaForCausalLM(cfg).eval()
    return model


def tiny_ministral(vocab=97, hidden=32, inter=48, layers=4, heads=4,
                   kv_heads=2, window=8, max_pos=64, seed=0):
    from transformers import MinistralConfig, MinistralForCausalLM

    torch.manual_seed(seed)
    cfg = MinistralConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        # HF's MinistralAttention does getattr(config, "head_dim") which
        # returns the config default None and crashes — pass it explicitly
        head_dim=hidden // heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, sliding_window=window,
        layer_types=["sliding_attention", "full_attention"] * (layers // 2),
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = MinistralForCausalLM(cfg).eval()
    return model


def tiny_vaultgemma(vocab=97, hidden=32, inter=48, layers=4, heads=4,
                    kv_heads=2, head_dim=16, window=8, max_pos=64, seed=0):
    from transformers import VaultGemmaConfig, VaultGemmaForCausalLM

    torch.manual_seed(seed)
    cfg = VaultGemmaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=head_dim,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        query_pre_attn_scalar=head_dim, sliding_window=window,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        hidden_activation="gelu_pytorch_tanh",
        attn_implementation="eager",
    )
    model = VaultGemmaForCausalLM(cfg).eval()
    return model


def tiny_xglm(vocab=97, hidden=32, ffn=64, layers=2, heads=4, max_pos=64,
              seed=0):
    from transformers import XGLMConfig, XGLMForCausalLM

    torch.manual_seed(seed)
    cfg = XGLMConfig(
        vocab_size=vocab, d_model=hidden, ffn_dim=ffn, num_layers=layers,
        attention_heads=heads, max_position_embeddings=max_pos,
        activation_function="gelu", scale_embedding=True,
        attn_implementation="eager",
    )
    model = XGLMForCausalLM(cfg).eval()
    return model


def tiny_biogpt(vocab=97, hidden=32, inter=64, layers=2, heads=4,
                max_pos=64, seed=0):
    from transformers import BioGptConfig, BioGptForCausalLM

    torch.manual_seed(seed)
    cfg = BioGptConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=max_pos, scale_embedding=True,
        attn_implementation="eager",
    )
    model = BioGptForCausalLM(cfg).eval()
    return model


def tiny_bitnet(vocab=97, hidden=32, inter=48, layers=2, heads=4,
                kv_heads=2, max_pos=64, seed=0):
    from transformers import BitNetConfig, BitNetForCausalLM

    torch.manual_seed(seed)
    cfg = BitNetConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rms_norm_eps=1e-6, hidden_act="relu2", tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = BitNetForCausalLM(cfg).eval()
    return model


def tiny_dots1(vocab=97, hidden=32, inter=48, moe_inter=24, layers=3,
               heads=4, kv_heads=2, experts=4, shared=1, top_k=2,
               n_group=2, topk_group=1, first_k_dense=1, window=8,
               max_pos=64, seed=0):
    from transformers import Dots1Config, Dots1ForCausalLM

    torch.manual_seed(seed)
    cfg = Dots1Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        moe_intermediate_size=moe_inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        n_routed_experts=experts, n_shared_experts=shared,
        num_experts_per_tok=top_k, n_group=n_group, topk_group=topk_group,
        first_k_dense_replace=first_k_dense, norm_topk_prob=True,
        routed_scaling_factor=1.5, sliding_window=window,
        layer_types=["sliding_attention", "full_attention",
                     "full_attention"][:layers],
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = Dots1ForCausalLM(cfg).eval()
    # the e_score correction bias buffer ships non-zero in real checkpoints
    for layer in model.model.layers[first_k_dense:]:
        layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
    return model


def tiny_flex_olmo(vocab=97, hidden=32, inter=48, layers=2, heads=4,
                   kv_heads=2, experts=4, top_k=2, max_pos=64, seed=0):
    from transformers import FlexOlmoConfig, FlexOlmoForCausalLM

    torch.manual_seed(seed)
    cfg = FlexOlmoConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, num_experts=experts,
        num_experts_per_tok=top_k, norm_topk_prob=False,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        pad_token_id=0,  # the config default is outside the tiny vocab
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = FlexOlmoForCausalLM(cfg).eval()
    return model


def tiny_zamba2(vocab=97, hidden=32, inter=64, layers=5, heads=4,
                kv_heads=4, head_dim=16, mamba_heads=8, mamba_headdim=8,
                d_state=16, n_groups=1, mem_blocks=2, adapters=True,
                rope=True, max_pos=64, seed=0):
    from transformers import Zamba2Config
    from transformers.models.zamba2.modeling_zamba2 import Zamba2ForCausalLM

    torch.manual_seed(seed)
    cfg = Zamba2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, attention_head_dim=head_dim,
        mamba_headdim=mamba_headdim, n_mamba_heads=mamba_heads,
        mamba_ngroups=n_groups, mamba_d_state=d_state, mamba_d_conv=4,
        mamba_expand=2, num_mem_blocks=mem_blocks, use_mem_rope=rope,
        use_shared_attention_adapter=adapters, adapter_rank=4,
        max_position_embeddings=max_pos, rms_norm_eps=1e-5,
        pad_token_id=0,
        layers_block_type=["mamba", "hybrid", "mamba", "hybrid",
                           "hybrid"][:layers],
        attn_implementation="eager",
    )
    model = Zamba2ForCausalLM(cfg).eval()
    return model


def tiny_jetmoe(vocab=97, hidden=32, inter=48, layers=2, kv_heads=4,
                kv_channels=8, experts=4, top_k=2, max_pos=64, seed=0):
    from transformers import JetMoeConfig
    from transformers.models.jetmoe.modeling_jetmoe import JetMoeForCausalLM

    torch.manual_seed(seed)
    cfg = JetMoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=top_k * kv_heads,
        num_key_value_heads=kv_heads, kv_channels=kv_channels,
        num_local_experts=experts, num_experts_per_tok=top_k,
        max_position_embeddings=max_pos, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = JetMoeForCausalLM(cfg).eval()
    return model
