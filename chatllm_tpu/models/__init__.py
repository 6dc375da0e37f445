"""Model zoo: self-registering per-arch loaders keyed by on-disk ModelType.

Reference analog: REGISTER_MODEL_LOADER registrations across
/root/reference/models/*.cpp (172 archs) dispatched by ModelFactory
(/root/reference/src/models.cpp:2104).
"""
from .base import (BaseConfig, BaseLLM, ParamBuilder, RuntimeConfig,
                   load_model, lookup_model, register_model)
from .model_types import ModelType

# import for registration side-effects
from . import llama      # noqa: F401
from . import qwen       # noqa: F401
from . import qwen_tts   # noqa: F401
from . import mistral    # noqa: F401
from . import gemma      # noqa: F401
from . import gemma4     # noqa: F401
from . import yi         # noqa: F401
from . import deepseek   # noqa: F401
from . import bce        # noqa: F401
from . import glm        # noqa: F401
from . import phi        # noqa: F401
from . import internlm   # noqa: F401
from . import internvl   # noqa: F401
from . import misc_llama # noqa: F401
from . import orpheus    # noqa: F401
from . import qwen_vl    # noqa: F401
from . import misc_llama2  # noqa: F401
from . import qwen_audio  # noqa: F401
from . import minicpm    # noqa: F401
from . import aliases    # noqa: F401
from . import glm_asr    # noqa: F401
from . import gpt_oss    # noqa: F401
from . import misc_wave2 # noqa: F401
from . import smolvlm    # noqa: F401
from . import adept      # noqa: F401
from . import janus      # noqa: F401
from . import misc_wave3 # noqa: F401
from . import alphageo   # noqa: F401
from . import baichuan_m1  # noqa: F401
from . import diffusion  # noqa: F401
from . import qwen3_vl_mod  # noqa: F401
from . import glm_vl     # noqa: F401
from . import qwen3_asr  # noqa: F401
from . import oute       # noqa: F401
from . import kimi_vl    # noqa: F401
from . import hunyuan_vl  # noqa: F401
from . import paddle_vl   # noqa: F401
from . import dots        # noqa: F401
from . import step        # noqa: F401
from . import qwen3_5     # noqa: F401
from . import neochat     # noqa: F401
from . import minicpm_o   # noqa: F401

__all__ = [
    "BaseConfig", "BaseLLM", "ParamBuilder", "RuntimeConfig",
    "load_model", "lookup_model", "register_model", "ModelType",
]
