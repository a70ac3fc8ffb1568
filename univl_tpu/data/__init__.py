from univl_tpu.data.tokenization import WordPieceTokenizer
from univl_tpu.data.batching import Batcher, prefetch_to_device
