"""igraph_spark — a PySpark-native link-graph analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
igraph C library (reference: /root/reference), re-expressed Spark-first:
the graph is an edge DataFrame, algorithms are iterative DataFrame
programs (BSP supersteps) driven by a checkpointing runner, and all
per-row compute is vectorized (built-in Catalyst expressions or Arrow
pandas UDFs — never per-row Python).

Public surface:

    Graph                    -- edge-DataFrame graph value class
    pagerank, personalized_pagerank
    connected_components     -- weak / strong
    label_propagation, modularity
    triangle_count, transitivity, ...

plus operator modules (structure, setops, similarity), data-pipeline
functions (text, dedup, ann), and deterministic generators.
"""

from igraph_spark.graph import Graph
from igraph_spark.algorithms.pagerank import pagerank, personalized_pagerank
from igraph_spark.algorithms.components import (
    connected_components,
    is_connected,
    component_sizes,
    decompose_membership,
)
from igraph_spark.algorithms.lpa import label_propagation, modularity
from igraph_spark.algorithms.triangles import (
    triangle_count,
    adjacent_triangles,
    transitivity_undirected,
    transitivity_local_undirected,
    list_triangles,
)
from igraph_spark.algorithms.kcore import coreness
from igraph_spark.algorithms.weighted_centrality import (
    betweenness_weighted,
    closeness_weighted,
)
from igraph_spark.algorithms.betweenness import (
    betweenness,
    edge_betweenness,
    girvan_newman,
)
from igraph_spark.algorithms.cliques import maximal_cliques
from igraph_spark.algorithms.louvain import multilevel_communities
from igraph_spark.algorithms.fastgreedy import fastgreedy_communities
from igraph_spark.algorithms.walktrap import walktrap_communities
from igraph_spark.algorithms.spinglass import spinglass_communities
from igraph_spark.algorithms.optimal import optimal_modularity
from igraph_spark.algorithms.embedding import (
    adjacency_spectral_embedding,
    laplacian_spectral_embedding,
)
from igraph_spark.algorithms.infomap import (
    infomap_communities,
    infomap_codelength,
    map_equation,
)
from igraph_spark.algorithms.centrality import (
    eigenvector_centrality,
    hits,
    dyad_census,
    centralization,
    centralization_degree,
    centralization_betweenness,
    centralization_closeness,
    centralization_eigenvector,
    constraint,
)
from igraph_spark.algorithms.motifs import (
    motifs4_directed,
    motifs4_undirected,
    motifs_randesu,
    motifs_randesu_sampled,
    triad_census,
)
from igraph_spark.algorithms.biconnected import (
    articulation_points,
    biconnected_components,
)
from igraph_spark.algorithms.community_metrics import compare_communities
from igraph_spark.algorithms.cliques import clique_number, cliques
from igraph_spark.algorithms.epidemics import sir
from igraph_spark.algorithms.spectral import leading_eigenvector_communities
from igraph_spark.algorithms.isomorphism import (
    count_automorphisms,
    count_subisomorphisms,
    is_isomorphic,
    subgraph_isomorphisms,
)
from igraph_spark.algorithms.hyperball import (
    average_path_length_approx,
    closeness_approx,
    effective_diameter,
    hyperball,
    neighborhood_function,
)
from igraph_spark.algorithms.atlas import atlas_table, graph_atlas
from igraph_spark.algorithms.canonical import (
    automorphism_generators,
    canonical_form,
    canonical_permutation,
    isomorphic_canonical,
    wl_colors,
    wl_fingerprint,
)
from igraph_spark.algorithms.paths import (get_all_shortest_paths,
    get_shortest_paths, girth)
from igraph_spark.algorithms.flow import (
    all_st_mincuts,
    cohesive_blocks,
    edge_connectivity,
    is_separator,
    gomory_hu_tree,
    maxflow,
    min_st_vertex_cut,
    mincut,
    minimum_size_separators,
    st_mincut,
    vertex_connectivity,
)
from igraph_spark.algorithms.mst import (
    is_forest,
    is_tree,
    laplacian,
    minimum_spanning_tree,
)
from igraph_spark.operators.bipartite import maximum_bipartite_matching
from igraph_spark.operators.isoclass import (graph_count, isoclass,
    isoclass_create)
from igraph_spark.operators.structure import (are_connected, assortativity_values,
    contract_vertices, from_adjacency, get_eids, permute_vertices,
    transitive_closure_dag, with_eids)
from igraph_spark.layouts import (
    layout_circle,
    layout_fruchterman_reingold,
    layout_grid,
    layout_davidson_harel,
    layout_drl,
    layout_gem,
    layout_kamada_kawai,
    layout_fruchterman_reingold_3d,
    layout_grid_3d,
    layout_random,
    layout_random_3d,
    layout_sphere,
    layout_sugiyama,
)
from igraph_spark.algorithms.visitors import bfs_order, dfs_order
from igraph_spark.algorithms.lsap import solve_lsap
from igraph_spark.algorithms.hrg import (hrg_fit, hrg_game, hrg_predict,
                                         hrg_sample)
from igraph_spark.algorithms.scg import (scg_adjacency, scg_grouping,
                                         scg_laplacian,
                                         scg_semiprojectors,
                                         scg_stochastic)
from igraph_spark.algorithms.graphlets import (graphlets,
                                               graphlets_candidate_basis,
                                               graphlets_project)
from igraph_spark.algorithms.decomposition import (is_chordal,
    maximum_cardinality_search)
from igraph_spark.algorithms.feedback import feedback_arc_set
from igraph_spark.algorithms.dynamic_graphs import (read_dynamic_velist,
    snapshot_edges, union_graph_projection, project_dynamic, evomine)
from igraph_spark.algorithms.fsm import (Pattern, FrequentPattern,
    db_embeddings, shallow_support, mib_support, egobased_support,
    db_support, gspan)
from igraph_spark.algorithms.games import moran_step, optimal_imitation
from igraph_spark.functions.powerlaw import power_law_fit
from igraph_spark.functions.nongraph import (convex_hull, running_mean,
    random_sample)
from igraph_spark.generators import (static_fitness_game,
    static_power_law_game)
from igraph_spark.algorithms.paths import (
    bfs_distances,
    get_all_simple_paths,
    delta_stepping,
    shortest_paths,
    average_path_length,
    diameter,
    eccentricity,
    closeness,
    random_walks,
)

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "hyperball",
    "neighborhood_function",
    "effective_diameter",
    "average_path_length_approx",
    "closeness_approx",
    "pagerank",
    "personalized_pagerank",
    "connected_components",
    "is_connected",
    "component_sizes",
    "decompose_membership",
    "label_propagation",
    "modularity",
    "triangle_count",
    "adjacent_triangles",
    "transitivity_undirected",
    "transitivity_local_undirected",
    "list_triangles",
    "coreness",
    "betweenness",
    "betweenness_weighted",
    "closeness_weighted",
    "edge_betweenness",
    "girvan_newman",
    "maximal_cliques",
    "cliques",
    "clique_number",
    "sir",
    "leading_eigenvector_communities",
    "multilevel_communities",
    "fastgreedy_communities",
    "spinglass_communities",
    "optimal_modularity",
    "adjacency_spectral_embedding",
    "laplacian_spectral_embedding",
    "infomap_communities",
    "infomap_codelength",
    "map_equation",
    "walktrap_communities",
    "eigenvector_centrality",
    "hits",
    "dyad_census",
    "centralization",
    "centralization_degree",
    "centralization_betweenness",
    "centralization_closeness",
    "centralization_eigenvector",
    "assortativity_values",
    "constraint",
    "triad_census",
    "motifs_randesu",
    "articulation_points",
    "biconnected_components",
    "compare_communities",
    "are_connected",
    "contract_vertices",
    "get_eids",
    "with_eids",
    "from_adjacency",
    "count_automorphisms",
    "count_subisomorphisms",
    "is_isomorphic",
    "subgraph_isomorphisms",
    "automorphism_generators",
    "atlas_table",
    "graph_atlas",
    "canonical_form",
    "canonical_permutation",
    "isomorphic_canonical",
    "wl_colors",
    "wl_fingerprint",
    "girth",
    "delta_stepping",
    "maxflow",
    "mincut",
    "st_mincut",
    "gomory_hu_tree",
    "edge_connectivity",
    "vertex_connectivity",
    "min_st_vertex_cut",
    "all_st_mincuts",
    "minimum_size_separators",
    "is_separator",
    "cohesive_blocks",
    "minimum_spanning_tree",
    "is_tree",
    "is_forest",
    "laplacian",
    "maximum_bipartite_matching",
    "graph_count",
    "isoclass",
    "isoclass_create",
    "motifs4_directed",
    "motifs4_undirected",
    "motifs_randesu_sampled",
    "layout_circle",
    "layout_grid",
    "layout_random",
    "layout_fruchterman_reingold",
    "layout_kamada_kawai",
    "layout_drl",
    "layout_gem",
    "layout_davidson_harel",
    "graphlets",
    "scg_grouping",
    "hrg_fit",
    "solve_lsap",
    "hrg_game",
    "hrg_sample",
    "hrg_predict",
    "scg_semiprojectors",
    "scg_adjacency",
    "scg_laplacian",
    "scg_stochastic",
    "graphlets_candidate_basis",
    "graphlets_project",
    "layout_fruchterman_reingold_3d",
    "layout_grid_3d",
    "layout_random_3d",
    "layout_sphere",
    "layout_sugiyama",
    "get_shortest_paths",
    "get_all_shortest_paths",
    "bfs_order",
    "dfs_order",
    "feedback_arc_set",
    "read_dynamic_velist", "snapshot_edges", "union_graph_projection",
    "project_dynamic", "evomine",
    "Pattern", "FrequentPattern", "db_embeddings", "shallow_support",
    "mib_support", "egobased_support", "db_support", "gspan",
    "moran_step",
    "power_law_fit",
    "convex_hull",
    "running_mean",
    "random_sample",
    "static_fitness_game",
    "static_power_law_game",
    "optimal_imitation",
    "is_chordal",
    "maximum_cardinality_search",
    "permute_vertices",
    "transitive_closure_dag",
    "bfs_distances",
    "get_all_simple_paths",
    "shortest_paths",
    "average_path_length",
    "diameter",
    "eccentricity",
    "closeness",
    "random_walks",
]
