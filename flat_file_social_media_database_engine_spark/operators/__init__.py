from .queries import get_all_user_comments, get_engagements_by_location
from .mutations import apply_view_deltas, validated_append, rename_user

__all__ = [
    "get_all_user_comments",
    "get_engagements_by_location",
    "apply_view_deltas",
    "validated_append",
    "rename_user",
]
