from vtm.merge.bipartite import (  # noqa: F401
    Matching,
    bipartite_soft_matching,
    bipartite_soft_matching_drop,
    bipartite_soft_matching_hybrid,
    kth_bipartite_soft_matching,
    random_bipartite_soft_matching,
    merge,
    unmerge,
    drop,
    merge_wavg,
    merge_source,
    drop_source,
)
from vtm.merge.policy import MergePolicy, MergeState, reduce_tokens  # noqa: F401
from vtm.merge.schedule import parse_r, token_counts, effective_r  # noqa: F401
