from qst_tpu.data.chunks import (
    ChunkStore,
    write_chunk,
    write_meta,
    read_meta,
    discover_chunks,
    chunk_path,
)
from qst_tpu.data.mining import (
    EmbeddingTable,
    NegativeMiner,
    mine_negatives,
    HARD_CONTRASTIVE_TRAIN,
    HARD_CONTRASTIVE_TEST,
    RANDOM,
)
from qst_tpu.data.quadruplet_dataset import QuadrupletDataset, choose_examples
from qst_tpu.data.collate import (
    QuadrupletBatch,
    QuadrupletCollator,
    select_single_example,
)

__all__ = [
    "ChunkStore",
    "write_chunk",
    "write_meta",
    "read_meta",
    "discover_chunks",
    "chunk_path",
    "EmbeddingTable",
    "NegativeMiner",
    "mine_negatives",
    "HARD_CONTRASTIVE_TRAIN",
    "HARD_CONTRASTIVE_TEST",
    "RANDOM",
    "QuadrupletDataset",
    "choose_examples",
    "QuadrupletBatch",
    "QuadrupletCollator",
    "select_single_example",
]
