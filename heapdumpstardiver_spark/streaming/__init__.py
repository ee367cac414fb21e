from .cdc_apply import (  # noqa: F401
    read_state,
    streaming_scd2_apply,
)
from .drift import (  # noqa: F401
    binned_window_counts,
    psi_from_counts,
    reference_cuts,
)
from .windowed import (  # noqa: F401
    click_view_attribution,
    running_counts_stateful,
    running_counts_tws,
    sessionized_counts,
    sliding_counts,
    stream_events,
    stream_static_enrich,
    streaming_dedup,
    tumbling_counts,
)
from .percolate import (  # noqa: F401
    percolate_matches,
    stream_documents,
    streaming_percolate,
)
from .mean_shift import (  # noqa: F401
    baseline_dim_means,
    mean_shift_from_sums,
    stream_embeddings,
    streaming_dim_sums,
)
from .lsh_dedup import (  # noqa: F401
    append_to_corpus_index,
    build_corpus_index,
    compact_corpus_index,
    dedup_and_append_batch,
    flag_batch,
    streaming_lsh_dedup,
)
from .phash_dedup import (  # noqa: F401
    append_to_phash_index,
    build_phash_index,
    compact_phash_index,
    dedup_and_append_image_batch,
    flag_batch_images,
    streaming_phash_dedup,
)
from .ivf_probe import (  # noqa: F401
    QUERY_SCHEMA,
    probe_ivf_index_batch,
    streaming_ivf_probe,
)
