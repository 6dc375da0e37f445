"""BCE / BGE-M3 embedding & reranker models (XLMRoberta encoders).

Reference: /root/reference/models/bce.{h,cpp}, bge.cpp.  Tokenizer is a
Unigram processor with newline/space preprocessors (bce.cpp Tokenizer::load).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.bert import (BertConfig, bert_forward, classification_score,
                       cls_embedding)
from ..runtime.chat import ChatTokenizer
from ..tokenizer.processor import (TextPrepAddLeadingSpace,
                                   TextPrepDeleteMultiSpaces,
                                   TextPrepNewlineToSpaces, UnigramProcessor)
from .base import BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig, register_model
from .model_types import ModelType


def make_bce_tokenizer(gf, base: BaseConfig) -> ChatTokenizer:
    tp = UnigramProcessor(base.eos_token_id + 1)
    tp.register_preprocessor(TextPrepNewlineToSpaces())
    tp.register_preprocessor(TextPrepDeleteMultiSpaces())
    tp.register_preprocessor(TextPrepAddLeadingSpace())
    tp.load(gf.tokenizer_reader(), base.vocab_size)
    tok = ChatTokenizer(tp, None, sys_prompt="")
    tok.bos_token_id = base.bos_token_id
    tok.eos_token_id = base.eos_token_id
    tok.pad_token_id = base.pad_token_id
    return tok


def load_roberta_params(pb: ParamBuilder, n_layers: int, *, classifier: bool):
    params = {
        "embed": {
            "word": pb.embedding("embeddings.word_embeddings.weight"),
            "pos": pb.embedding("embeddings.position_embeddings.weight"),
            "ln": pb.norm("embeddings.LayerNorm", bias=True),
        },
        "layers": [],
    }
    for i in range(n_layers):
        pfx = f"encoder.layer.{i}"
        params["layers"].append({
            "attn": {
                "q": pb.linear(f"{pfx}.attention.self.query", bias=True),
                "k": pb.linear(f"{pfx}.attention.self.key", bias=True),
                "v": pb.linear(f"{pfx}.attention.self.value", bias=True),
                "o": pb.linear(f"{pfx}.attention.output.dense", bias=True),
            },
            "post_attn_ln": pb.norm(f"{pfx}.attention.output.LayerNorm", bias=True),
            "mlp": {
                "intermediate": pb.linear(f"{pfx}.intermediate.dense", bias=True),
                "output": pb.linear(f"{pfx}.output.dense", bias=True),
            },
            "output_ln": pb.norm(f"{pfx}.output.LayerNorm", bias=True),
        })
    params["layers"] = tuple(params["layers"])
    if classifier:
        params["classifier"] = {
            "dense": pb.linear("classifier.dense", bias=True),
            "out_proj": pb.linear("classifier.out_proj", bias=True),
        }
    return params


class BertModelBase(BaseLLM):
    IS_RANKER = False

    @classmethod
    def load(cls, gf, rt: RuntimeConfig):
        base, _ = BaseConfig.parse(gf)
        cfg = BertConfig(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            num_hidden_layers=base.num_hidden_layers,
            num_attention_heads=base.num_attention_heads,
            intermediate_size=base.intermediate_size,
            max_length=base.max_length)
        tok = make_bce_tokenizer(gf, base)
        pb = ParamBuilder(gf, rt)
        params = load_roberta_params(pb, base.num_hidden_layers,
                                     classifier=cls.IS_RANKER)
        return cls(gf.model_type, cfg, params, tok, native_config=base, meta=gf.meta)

    # BaseLLM.engine is decode-oriented; encoders run a single forward
    @property
    def engine(self):
        raise TypeError("encoder model: use embed()/qa_rank()")

    def _encode_ids(self, text: str, max_length: int) -> list[int]:
        # bce.cpp Tokenizer::encode: bos + truncated body + eos, budget
        # max_length-2 for the position offset
        budget = max_length - 2
        ids = self.tokenizer.encode(text)[: budget - 2]
        return [self.tokenizer.bos_token_id] + ids + [self.tokenizer.eos_token_id]

    def _run(self, ids: list[int]):
        arr = jnp.asarray(np.asarray([ids], np.int32))
        return bert_forward(self.cfg, self.params, arr)


@register_model(ModelType.BCE_Embedding, ModelType.BGE_M3)
class BCEEmbedding(BertModelBase):
    def embed(self, text: str) -> np.ndarray:
        """Text embedding (reference AbstractModel::text_embedding →
        BCEFinalNorm CLS pooling)."""
        hidden = self._run(self._encode_ids(text, self.cfg.max_length))
        return np.asarray(cls_embedding(hidden))[0]

    @property
    def embedding_dim(self) -> int:
        return self.cfg.hidden_size


@register_model(ModelType.BCE_ReRanker, ModelType.BGE_ReRanker_M3)
class BCEReranker(BertModelBase):
    IS_RANKER = True

    def qa_rank(self, question: str, answer: str) -> float:
        """Cross-encoder relevance score (reference bce.cpp ranker
        encode_qa: bos q eos eos a eos)."""
        tok = self.tokenizer
        max_len = self.cfg.max_length - 2
        q_ids = tok.encode(question)
        a_ids = tok.encode(answer)
        if len(q_ids) + len(a_ids) > max_len - 4:
            remain = max_len - 4 - len(q_ids)
            assert remain > 0, "query too long"
            a_ids = a_ids[:remain]
        ids = ([tok.bos_token_id] + q_ids + [tok.eos_token_id, tok.eos_token_id]
               + a_ids + [tok.eos_token_id])
        hidden = self._run(ids)
        return float(classification_score(self.params["classifier"], hidden)[0])
