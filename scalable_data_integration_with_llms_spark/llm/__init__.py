from .boundary import llm_map, mock_score_candidates, MOCK_NO_MATCH_MILLI

__all__ = ["llm_map", "mock_score_candidates", "MOCK_NO_MATCH_MILLI"]
