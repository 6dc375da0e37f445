from .processor import (
    TokenType,
    Vocab,
    Processor,
    BPEProcessor1,
    BPEProcessor2,
    BPEProcessor3,
    UnigramProcessor,
    TextPrepTrim,
    TextTrim,
    TextPrepDeleteMultiSpaces,
    TextPrepNewlineToSpaces,
    TextPrepAddLeadingSpace,
)
