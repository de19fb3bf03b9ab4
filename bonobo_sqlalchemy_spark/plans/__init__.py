from .graph import Graph, NodeExecutionContext, run

__all__ = ["Graph", "NodeExecutionContext", "run"]
