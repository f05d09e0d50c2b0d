from logdag_spark.fixtures.generator import (  # noqa: F401
    DEFAULT_T0,
    contract,
    gen_tokens,
    ground_truth_edges,
    host_meta,
    host_rows,
    stream_specs,
    template_dim,
    template_specs,
)
