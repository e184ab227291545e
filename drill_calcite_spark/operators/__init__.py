from drill_calcite_spark.operators.match_recognize import (StatefulDef,
    match_recognize)
from drill_calcite_spark.operators.repeat_union import repeat_union
from drill_calcite_spark.operators.asof import asof_join
from drill_calcite_spark.operators.snapshot import snapshot
from drill_calcite_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_signature,
)
from drill_calcite_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_ann_topk,
)
from drill_calcite_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from drill_calcite_spark.operators.bloom import bloom_build, bloom_prune
from drill_calcite_spark.operators.polyclip import (
    clip_polygon_rings, polygon_setop_rings, rings_area,
)
from drill_calcite_spark.operators.qsketch import (
    qsketch_build,
    qsketch_merge,
    qsketch_quantiles,
)
from drill_calcite_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    cms_sketch,
    hll_merge,
    hll_registers,
    hll_summary,
)

__all__ = [
    "match_recognize", "StatefulDef", "repeat_union", "asof_join", "snapshot",
    "exact_dedup", "minhash_lsh_dedup", "ngram_jaccard_pairs",
    "simhash_signature",
    "cosine_topk", "embedding_near_dup_pairs", "lsh_ann_topk",
    "attach_binary_payload", "extract_features",
    "bloom_build", "bloom_prune",
    "clip_polygon_rings", "polygon_setop_rings", "rings_area",
    "cms_sketch", "cms_merge", "cms_estimate",
    "qsketch_build", "qsketch_merge", "qsketch_quantiles",
    "hll_registers", "hll_merge", "hll_summary",
]
