"""Multi-object trackers: ByteTrack, BoT-SORT (+GMC), Kalman filters."""

from .bot_sort import BOTSORT, BOTrack
from .byte_tracker import BYTETracker, STrack
from .track import make_tracker, track_stream

__all__ = ["BOTSORT", "BOTrack", "BYTETracker", "STrack", "make_tracker", "track_stream"]
