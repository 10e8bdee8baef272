"""Split registry parts — imported in order by ..registry."""
from . import part01_vector_chunk_text_dedup_rag_ann  # noqa: F401,E402
from . import part02_index_build_diag_curation  # noqa: F401,E402
from . import part03_samplegen_retrieval_stats  # noqa: F401,E402
from . import part04_experimentation_layout  # noqa: F401,E402
from . import part05_statistics_calibration  # noqa: F401,E402
from . import part06_search_governance_product  # noqa: F401,E402
from . import part07_attribution_decision  # noqa: F401,E402
from . import part08_learning_recsys_forecast  # noqa: F401,E402
