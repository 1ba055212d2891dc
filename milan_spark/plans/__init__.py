from milan_spark.plans.nodes import Node, to_json, from_json, compile_node
from milan_spark.plans.backend_streaming import compile_node_streaming
from milan_spark.plans.backend_event import EventHandler, compile_event
from milan_spark.plans.validate import validate_plan

__all__ = [
    "Node",
    "to_json",
    "from_json",
    "compile_node",
    "compile_node_streaming",
    "compile_event",
    "EventHandler",
    "validate_plan",
]
