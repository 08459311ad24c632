from entity_extractor_spark.matching.context import extract_context_window
from entity_extractor_spark.matching.matcher import GazetteerMatcher

__all__ = ["extract_context_window", "GazetteerMatcher"]
