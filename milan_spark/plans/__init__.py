from milan_spark.plans.nodes import Node, to_json, from_json, compile_node

__all__ = ["Node", "to_json", "from_json", "compile_node"]
