from gardenia_tpu.core.graph import Graph, load_graph

__all__ = ["Graph", "load_graph"]
