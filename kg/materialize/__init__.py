from kg.materialize.documents import (  # noqa: F401
    as_graphson_edges,
    denormalize_endpoints,
    edge_namespace,
    json_array,
    rename_reserved_keys,
)
from kg.materialize.stage import run_materialize  # noqa: F401
