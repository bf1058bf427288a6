from .dedup import dedup_turns, dedup_turns_deterministic  # noqa: F401
from .window_filter import window_filter  # noqa: F401
from .batching import assign_batches  # noqa: F401
from .packets import split_packets  # noqa: F401
from .packing import pack_sequences, packing_summary  # noqa: F401
from .contamination import contamination_check  # noqa: F401
from .bloom import BloomSpec, bloom_prefilter, bloom_semi_join, build_bloom  # noqa: F401
from .pq import pq_encode, pq_topk, pq_train  # noqa: F401
from .sketches import merge_profiles, sketch_profile  # noqa: F401
