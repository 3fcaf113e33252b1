from lakehouse_architecture_transaction_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    exact_text_dedup,
    fingerprint,
    minhash_signature,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    shingle_expr,
    tokens_expr,
)
from lakehouse_architecture_transaction_spark.operators.merge import merge_upsert  # noqa: F401
from lakehouse_architecture_transaction_spark.operators.similarity import cosine_topk, label_centroids, sign_lsh_ann  # noqa: F401
from lakehouse_architecture_transaction_spark.operators.text import lang_id, quality_score, token_stats  # noqa: F401
