from .token_types import TokenType
from .tokenizer import DiscreteTokenizer, tokenize_keypoints

__all__ = ["TokenType", "DiscreteTokenizer", "tokenize_keypoints"]
