"""Evaluation operators (E1-E7): linking recall@k, NIL confusion matrices,
clustering B³/MUC/CEAF-e, overall accuracy decomposition, report assembly."""
