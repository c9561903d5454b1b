from .cc import connected_components, cc_count  # noqa: F401
from .facade import cc, CCResult, pagerank_auto, PRResult  # noqa: F401
from .pagerank import pagerank  # noqa: F401
from .labelprop import label_propagation  # noqa: F401
from .triangles import clustering_coefficient, triangle_count, triangles_per_graph  # noqa: F401
from .hits import hits  # noqa: F401
from .kcore import coreness, k_core  # noqa: F401
from .scc import strongly_connected_components  # noqa: F401
from .bowtie import bowtie  # noqa: F401
from .anf import anf, effective_diameter  # noqa: F401
from .degrees import degree_table  # noqa: F401
from .frontier import connected_components_frontier  # noqa: F401
