"""Model components: encoder, head, tokenizer."""

from .encoder import Encoder, EncoderConfig, encoder_forward, embed_texts_device
from .head import AdaptiveHead, MultiLabelAdaptiveHead, init_head, head_forward
from .tokenizer import WordPieceTokenizer

__all__ = [
    "Encoder", "EncoderConfig", "encoder_forward", "embed_texts_device",
    "AdaptiveHead", "MultiLabelAdaptiveHead", "init_head", "head_forward",
    "WordPieceTokenizer",
]
