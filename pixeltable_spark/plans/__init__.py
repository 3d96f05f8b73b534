from .query import Query, TableRef, SampleClause, JoinClause, Planner

__all__ = ["Query", "TableRef", "SampleClause", "JoinClause", "Planner"]
