from .graph import Graph, NodeExecutionContext, Producer, producer, run

__all__ = ["Graph", "NodeExecutionContext", "Producer", "producer", "run"]
