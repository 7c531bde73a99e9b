from .mcl import mcl_cluster
from .components import strongly_connected_components, maximal_cliques
