"""The on-disk architecture id space (ABI-compatible with model files
produced by the reference converter).

Mirrors /root/reference/src/models_priv.h:8-245 `enum ModelType` and the
purpose/modality tag bit scheme.  Values are part of the GGMM file format —
they must match exactly.
"""
from __future__ import annotations

import enum


def _make_purpose_tag(v: int) -> int:
    return v << 20


def _make_type_tag(purpose: int, v: int) -> int:
    if purpose == 0:
        return (v >> 1) << 24
    return _make_purpose_tag(purpose) | (v << 23)


class ModelPurpose:
    Chat = 0
    Emb = 1
    Ranker = 2
    TTS = 3
    ASR = 4


class AccessPoint:
    Text = 1
    ImageInput = 2
    ImageOutput = 4
    AudioInput = 8
    AudioOutput = 16
    VideoInput = 32


TAG_ChatImageIn = _make_type_tag(ModelPurpose.Chat, AccessPoint.Text + AccessPoint.ImageInput)
TAG_ChatAudioIn = _make_type_tag(ModelPurpose.Chat, AccessPoint.Text + AccessPoint.AudioInput)
TAG_ChatImageInVideoIn = _make_type_tag(ModelPurpose.Chat, AccessPoint.Text + AccessPoint.ImageInput + AccessPoint.VideoInput)
TAG_ChatImageInVideoInAudioIn = _make_type_tag(ModelPurpose.Chat, AccessPoint.Text + AccessPoint.ImageInput + AccessPoint.VideoInput + AccessPoint.AudioInput)
TAG_ChatImageInVideoInAudioInAudioOut = _make_type_tag(ModelPurpose.Chat, AccessPoint.Text + AccessPoint.ImageInput + AccessPoint.VideoInput + AccessPoint.AudioInput + AccessPoint.AudioOutput)
TAG_ChatImageInImageOut = _make_type_tag(ModelPurpose.Chat, AccessPoint.Text + AccessPoint.ImageInput + AccessPoint.ImageOutput)
TAG_EmbTextImage = _make_type_tag(ModelPurpose.Emb, AccessPoint.Text + AccessPoint.ImageInput)
TAG_RankTextImage = _make_type_tag(ModelPurpose.Ranker, AccessPoint.Text + AccessPoint.ImageInput)


def get_purpose_tag(v: int) -> int:
    return (v >> 20) & 0x7


class ModelType(enum.IntEnum):
    CHATGLM = 1
    CHATGLM2 = 2
    CHATGLM3 = 3
    CODEGEEX2 = 4
    CHARACTERGLM = 5
    GLM4 = 6
    CODEGEEX4 = 7
    GLM4_0414 = 8

    INTERNLM = 0x100
    INTERNLM2 = 0x101
    INTERNLM2_1 = 0x102
    INTERNLM3 = 0x103

    LLAMA2 = 0x150
    CODELLAMA = 0x151
    WIZARDCODER = 0x152
    WIZARDLM = 0x153
    WIZARDMATH = 0x154
    TIGERBOT = 0x155
    LLAMA2PLUS = 0x156
    MEGREZ = 0x157
    FALCON3 = 0x158
    REKA_FLASH3 = 0x159

    BAICHUANLLAMA = 0x200
    BAICHUAN = 0x201
    BAICHUAN_M1 = 0x202

    DEEPSEEK = 0x300
    DEEPSEEK_CODER = 0x301
    CODEFUSE_DEEPSEEK = 0x302
    NUMINAMATH = 0x303
    DEEPSEEK_V2_LIGHT = 0x320
    DEEPSEEK_V2 = 0x321
    DEEPSEEK_V3_LIGHT = 0x322
    DEEPSEEK_V3 = 0x323
    DEEPSEEK_V1_MoE = 0x324
    GIGACHAT = 0x325
    BAILINGMOE = 0x326
    XVERSEMOE = 0x327

    YI = 0x400
    MAP_NEO = 0x401

    PHI2 = 0x500
    PHI2_V2 = 0x501
    PHI3 = 0x520
    PHI3_SU = 0x521
    PHI3_SU2 = 0x522
    PHI3_SU3 = 0x523
    PHI3_MOE = 0x530
    PHI4 = 0x531
    PHI4_MINI = 0x532

    DOLPHINPHI2 = 0x510
    DOLPHINPHI2_V2 = 0x511

    MISTRAL = 0x600
    MIXTRAL = 0x601
    OPENCHAT = 0x602
    NEURALBEAGLE = 0x603
    STARLING = 0x604
    WIZARDLM2_MOE = 0x605
    MISTRAL2 = 0x606
    DEEPHERMES3_MISTRAL = 0x607

    QWEN = 0x700
    QWEN2 = 0x710
    QWEN2TIE = 0x711
    QWEN2MoE = 0x750
    MARCO_O1 = 0x751
    QWQ = 0x752
    READERLM2 = 0x753
    DEEPSEEK_R1_DISTILL_QWEN = 0x754
    QWEN3 = 0x755
    DEEPSEEK_R1_DISTILL_QWEN3 = 0x756

    BLUELM = 0x800
    STABLELM = 0x900
    ORION = 0x1000

    MINICPM = 0x1100
    MINICPM2 = 0x1101
    MINICPM_MoE = 0x1102
    MINICPM3 = 0x1110
    MINICPM4 = 0x1111
    MINICPM5 = 0x1112

    PERSIMMON = 0x1200
    FUYU = 0x1201

    GEMMA = 0x1300
    GEMMA2 = 0x1301
    GEMMA3 = 0x1302
    RNJ_1 = 0x1303

    COHERE_COMMAND_R = 0x1400
    COHERE_AYA_23 = 0x1401
    COHERE_COMMAND_R7B = 0x1402

    GROK_1 = 0x1500
    ZHINAO = 0x1600

    LLAMA3 = 0x1700
    SMOLLM = 0x1701
    LLAMA3_GROQ_TOOL = 0x1702
    LLAMA3_1 = 0x1703
    LLAMA3_2 = 0x1704
    EXAONE = 0x1705
    DEEPSEEK_R1_DISTILL_LLAMA = 0x1706
    AQUILA2 = 0x1707
    ERNIE_DENSE = 0x1708

    STARCODER2 = 0x1800
    XVERSE = 0x1900
    INDEX = 0x1A00

    OLMoE = 0x1B00
    OLMo2 = 0x1B01

    ALPHAGEO_LM = 0x1C00

    GRANITE_MoE = 0x1D00
    GRANITE = 0x1D01

    TELECHAT2 = 0x1E00

    HUNYUAN_DENSE = 0x1F00
    HUNYUAN_MOE_V1 = 0x1F01
    HUNYUAN_DENSE_V1 = 0x1F02
    WEDLM = 0x1F03                 # models/hunyuan.cpp:10 (diffusion LM)
    YOUTU = 0x1F04                 # models/hunyuan.cpp:11
    HUNYUAN_V3 = 0x1F05            # models/hunyuan.cpp:12

    MOONLIGHT = 0x2000
    INSTELLA = 0x2100
    DECILM = 0x2200
    SOLARPRO = 0x2300
    APRIEL = 0x2400
    ERNIE_MOE = 0x2500
    PANGU_MOE = 0x2600
    PANGU_EMBEDDED = 0x2601
    SMOLLM3 = 0x2700
    EXAONE4 = 0x2800
    JIUTIAN = 0x2900
    OPENAI = 0x2A00
    GPT_OSS = 0x2A00 + 0           # models/gpt.cpp MODEL_TYPE_GPT_OSS
    SEED = 0x2B00
    APERTUS = 0x2C00
    GROVE_MOE = 0x2D00
    BAILING_MOE2 = 0x2E00
    LLADA2 = 0x2E01                # models/bailing.cpp:11 (diffusion LM)
    GLM_MOE_LITE = 9               # models/chatglm.cpp:13
    MEGREZ_MOE = 0x2F00
    OURO = 0x3000
    MELLUM = 0x3010
    NANBEIGE = 0x3020

    BCE_Embedding = 0x10000100
    BCE_ReRanker = 0x10000101
    BGE_M3 = 0x10000102
    BGE_ReRanker_M3 = 0x10000103
    MiniCPM_Embedding_Light = 0x10000104
    MiniCPM_ReRanker_Light = 0x10000105
    ORPHEUS_TTS = 0x10000106
    OUTE_TTS_LLAMA = 0x10000107
    OUTE_TTS_QWEN3 = 0x10000108
    QWEN3_Embedding = 0x10000109
    QWEN3_ReRanker = 0x1000010A
    MAYA1 = 0x1000010B
    GLM_ASR = 0x1000010D
    QWEN3_TTS = 0x1000010E
    QWEN3_ASR = 0x1000010F

    LLAMA_MULTI = 0x20000001

    LLAMA4 = TAG_ChatImageIn + 0x00001
    GEMMA3Vis = TAG_ChatImageIn + 0x00011
    DOTS_OCR = TAG_ChatImageIn + 0x00020
    MISTRAL3 = TAG_ChatImageIn + 0x00030
    STEP_VL = TAG_ChatImageIn + 0x00040
    GLM_OCR = TAG_ChatImageIn + 0x00050
    INTERN_VL = TAG_ChatImageIn + 0x00060
    PADDLE_OCR_VL = TAG_ChatImageIn + 0x00070

    QWEN2_AUDIO = TAG_ChatAudioIn + 0x00001
    QWEN3_ForcedAligner = TAG_ChatAudioIn + 0x00002  # models/qwen.cpp:13

    QWEN2_5_VL = TAG_ChatImageInVideoIn + 0x00001
    QWEN2_VL = TAG_ChatImageInVideoIn + 0x00002
    QWEN3_VL = TAG_ChatImageInVideoIn + 0x00003
    QWEN3_5 = TAG_ChatImageInVideoIn + 0x00004   # models/qwen3_5.cpp:7
    GLM4V = TAG_ChatImageInVideoIn + 0x00040
    KIMI_VL = TAG_ChatImageInVideoIn + 0x00100
    SMOL_VLM = TAG_ChatImageInVideoIn + 0x00200
    YOUTU_VL = TAG_ChatImageInVideoIn + 0x00220
    PENGUIN_VL = TAG_ChatImageInVideoIn + 0x00221  # models/hunyuan.cpp:13
    LocateAnything = TAG_ChatImageInVideoIn + 0x00230

    GEMMA4 = TAG_ChatImageInVideoInAudioIn + 0x00001
    GEMMA4_Unified = TAG_ChatImageInVideoInAudioIn + 0x00002  # gemma4.cpp:7

    # reference convert.py:294 (MiniCPM_O; converter-only in the reference —
    # its C++ runtime never registers this id)
    MINICPM_O = TAG_ChatImageInVideoInAudioInAudioOut + 0x00001

    JANUS_PRO = TAG_ChatImageInImageOut + 0x00001
    NEOCHAT = TAG_ChatImageInImageOut + 0x00010

    QWEN3_VL_Embedding = TAG_EmbTextImage + 0x00001
    QWEN3_VL_ReRanker = TAG_RankTextImage + 0x00001
