"""Component-iterator classes under the reference's import path
(reference pixeltable/iterators/: ComponentIterator base + the six
concrete splitters). The reference's classes are themselves thin shims —
each `create(**kwargs)` delegates to the same-named function (reference
iterators/audio.py:17) — and so are these: `create()` returns the
DataFrame→DataFrame callable that `Catalog.create_view(iterator=...)`
consumes, bound to the engine's splitter with the reference's kwarg
names mapped.

Column-expression kwargs (document=t.col, audio=t.col, ...) accept a
ColumnRef or a plain column-name string; the view machinery applies the
iterator to the base table's DataFrame, so only the NAME is needed.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from pyspark.sql import DataFrame


def _col_name(val: Any, default: str) -> str:
    if val is None:
        return default
    if isinstance(val, str):
        return val
    name = getattr(val, "name", None) or getattr(val, "col_name", None)
    if isinstance(name, str):
        return name
    raise TypeError(f"expected a column name or ColumnRef, got {val!r}")


class ComponentIterator:
    """Base marker (reference iterators/base.py:14 ComponentIterator).
    Subclasses implement `create(**kwargs) -> Callable[[DataFrame],
    DataFrame]`."""

    @classmethod
    def create(cls, **kwargs: Any) -> Callable[[DataFrame], DataFrame]:
        raise NotImplementedError


def _as_view_iterator(splitter: Callable[..., DataFrame],
                      pos_col: str = "pos") -> Callable[[DataFrame], DataFrame]:
    """Adapt a (df, id_col=...) splitter to the create_view(iterator=...)
    contract: when the base carries MVCC system columns, the splitter runs
    keyed on _rowid (so every component row stays joined to its base row)
    and its ordinal is exposed as _pos; a plain DataFrame passes through
    with the natural id column.

    NESTED component views (a view over a component view — reference
    exposes one pos level per iterator, _query.py:1446-1538): the base
    frame already carries _pos[, _pos_2, ...]. The splitter is then keyed
    on the FULL component identity (base _rowid + every parent ordinal),
    packed into one struct key — keying on _rowid alone would collide two
    parent components of the same base row (their sub-component ordinals
    both restart at 0) and drop the parent ordinals entirely. The new
    (deepest) level lands as _pos_<depth+1>."""
    def it(df: DataFrame) -> DataFrame:
        if "_rowid" in df.columns:
            pos_levels = sorted(c for c in df.columns
                                if c == "_pos" or c.startswith("_pos_"))
            if not pos_levels:
                out = splitter(df, id_col="_rowid")
                if pos_col in out.columns and "_pos" not in out.columns:
                    out = out.withColumnRenamed(pos_col, "_pos")
                return out
            from pyspark.sql import functions as F
            key_cols = ["_rowid"] + pos_levels
            src = df.withColumn("__ckey", F.struct(*key_cols))
            out = splitter(src, id_col="__ckey")
            for c in key_cols:
                out = out.withColumn(c, F.col("__ckey." + c))
            out = out.drop("__ckey")
            new_level = f"_pos_{len(pos_levels) + 1}"
            if pos_col in out.columns:
                out = out.withColumnRenamed(pos_col, new_level)
            return out
        id_col = next((c for c in ("doc_id", "media_id")
                       if c in df.columns), df.columns[0])
        return splitter(df, id_col=id_col)
    return it


class DocumentSplitter(ComponentIterator):
    """reference iterators/document.py DocumentSplitter."""

    @classmethod
    def create(cls, *, document: Any = None, separators: str = "token_limit",
               limit: int = 300, overlap: int = 0, metadata: str = "",
               input_format: str = "text",
               **kwargs: Any) -> Callable[[DataFrame], DataFrame]:
        from .functions.document import document_splitter_v2
        text_col = _col_name(document, "text")

        def split(df: DataFrame, id_col: str) -> DataFrame:
            return document_splitter_v2(
                df, separators=separators, limit=limit, overlap=overlap,
                metadata=metadata, text_col=text_col, id_col=id_col,
                input_format=input_format)
        return _as_view_iterator(split)


class StringSplitter(ComponentIterator):
    """reference iterators/string.py StringSplitter (separators =
    'sentence' | 'paragraph' | a regex)."""

    _SEPARATORS = {"sentence": r"(?<=[.!?])\s+", "paragraph": r"\n\s*\n"}

    @classmethod
    def create(cls, *, text: Any = None, separators: str = "sentence",
               **kwargs: Any) -> Callable[[DataFrame], DataFrame]:
        from .functions.document import string_splitter
        text_col = _col_name(text, "text")
        sep = cls._SEPARATORS.get(separators, separators)

        def split(df: DataFrame, id_col: str) -> DataFrame:
            return string_splitter(df, separator=sep, text_col=text_col,
                                   id_col=id_col)
        return _as_view_iterator(split)


class AudioSplitter(ComponentIterator):
    """reference iterators/audio.py AudioSplitter (duration/overlap/
    min_segment seconds — functions/audio.py:472)."""

    @classmethod
    def create(cls, *, audio: Any = None, duration: float = 30.0,
               overlap: float = 0.0, min_segment: float = 0.0,
               **kwargs: Any) -> Callable[[DataFrame], DataFrame]:
        from .functions.audio import audio_splitter_time
        payload_col = _col_name(audio, "payload")

        def split(df: DataFrame, id_col: str) -> DataFrame:
            return audio_splitter_time(
                df, duration=duration, overlap=overlap,
                min_segment=min_segment, payload_col=payload_col,
                id_col=id_col)
        return _as_view_iterator(split)


class TileIterator(ComponentIterator):
    """reference iterators/image.py TileIterator."""

    @classmethod
    def create(cls, *, image: Any = None, tile_size: tuple = (224, 224),
               overlap: tuple = (0, 0),
               **kwargs: Any) -> Callable[[DataFrame], DataFrame]:
        from .functions.image import tile_iterator
        payload_col = _col_name(image, "payload")

        def split(df: DataFrame, id_col: str) -> DataFrame:
            return tile_iterator(df, tile_size=tuple(tile_size),
                                 overlap=tuple(overlap),
                                 payload_col=payload_col, id_col=id_col)
        return _as_view_iterator(split)


class FrameIterator(ComponentIterator):
    """reference functions/video/iterators.py FrameIterator
    (fps = extraction rate, num_frames = evenly spaced exact count)."""

    @classmethod
    def create(cls, *, video: Any = None, fps: Optional[float] = None,
               num_frames: Optional[int] = None, every_n: int = 30,
               **kwargs: Any) -> Callable[[DataFrame], DataFrame]:
        from .functions.video import frame_iterator
        payload_col = _col_name(video, "payload")

        def split(df: DataFrame, id_col: str) -> DataFrame:
            return frame_iterator(df, every_n=every_n,
                                  payload_col=payload_col, id_col=id_col,
                                  fps=fps, num_frames=num_frames)
        return _as_view_iterator(split, pos_col="frame_idx")


class VideoSplitter(ComponentIterator):
    """reference functions/video/iterators.py VideoSplitter
    (fixed-duration, optionally overlapping segments)."""

    @classmethod
    def create(cls, *, video: Any = None, duration: float = 1.0,
               overlap: float = 0.0,
               **kwargs: Any) -> Callable[[DataFrame], DataFrame]:
        from .functions.video import video_splitter
        payload_col = _col_name(video, "payload")

        def split(df: DataFrame, id_col: str) -> DataFrame:
            return video_splitter(df, duration=duration, overlap=overlap,
                                  payload_col=payload_col, id_col=id_col)
        return _as_view_iterator(split)


__all__ = ["ComponentIterator", "DocumentSplitter", "StringSplitter",
           "AudioSplitter", "TileIterator", "FrameIterator",
           "VideoSplitter"]
