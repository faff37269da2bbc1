"""Deterministic YouTube-API-shaped fixtures (FIXTURES.md §A1).

Generates the raw landing JSONL the scrape stage would produce, with
every nasty case the reference's cleaning chain must handle: ';' in
text, emoji/non-ASCII, real tab/newline/CR, *literal* backslash
sequences, multi-page pagination, zero-comment videos, replies,
missing tags.  Used by the golden-parity tests (SURVEY §5.2).
"""

from __future__ import annotations

import json
import os

# Strings chosen to exercise C1 (';'), C2 (non-ASCII/emoji), C3 (control
# chars AND literal backslash sequences, two-pass semantics).
NASTY_TITLE = "Top; 10 café tricks \U0001f600\tnew\\tline"
#  C1: ';'->','  C2: é and emoji dropped (spaces stay)  C3: real \t and
#  literal '\t' removed
NASTY_TITLE_CLEAN = "Top, 10 caf tricks newline"

NASTY_COMMENT = "love\nthis; video ❤️\\n really"
NASTY_COMMENT_CLEAN = "lovethis, video  really"

SEARCH_PAGES = [
    {
        "nextPageToken": "PAGE2",
        "items": [
            {
                "id": {"videoId": "vidA"},
                "snippet": {
                    "publishedAt": "2021-03-05T10:15:00Z",
                    "title": NASTY_TITLE,
                    "description": "short A…",
                },
            },
            {
                "id": {"videoId": "vidB"},
                "snippet": {
                    "publishedAt": "2021-03-06T23:59:59Z",
                    "title": "plain title B",
                    "description": "short B",
                },
            },
        ],
    },
    {
        "nextPageToken": None,
        "items": [
            {
                "id": {"videoId": "vidC"},
                "snippet": {
                    "publishedAt": "2021-04-01T00:00:00Z",
                    "title": "title C",
                    "description": "short C",
                },
            }
        ],
    },
]

COMMENT_PAGES = [
    {
        "nextPageToken": "P2",
        "items": [
            {
                "snippet": {
                    "topLevelComment": {
                        "snippet": {
                            "textOriginal": NASTY_COMMENT,
                            "publishedAt": "2021-03-05T12:00:00Z",
                            "videoId": "vidA",
                            "authorDisplayName": "Ali;ce é",
                            "likeCount": 3,
                        }
                    }
                },
                "replies": {
                    "comments": [
                        {
                            "snippet": {
                                "textOriginal": "reply one",
                                "publishedAt": "2021-03-05T13:00:00Z",
                                "videoId": "vidA",
                                "authorDisplayName": "Bob",
                                "likeCount": 0,
                            }
                        },
                        {
                            "snippet": {
                                "textOriginal": "reply\ttwo",
                                "publishedAt": "2021-03-05T14:30:00Z",
                                "videoId": "vidA",
                                "authorDisplayName": "Cara",
                                "likeCount": 1,
                            }
                        },
                    ]
                },
            },
            {
                "snippet": {
                    "topLevelComment": {
                        "snippet": {
                            "textOriginal": "no replies here",
                            "publishedAt": "2021-03-06T09:00:00Z",
                            "videoId": "vidB",
                            "authorDisplayName": "Dee",
                            "likeCount": 7,
                        }
                    }
                },
                "replies": None,
            },
        ],
    },
    {
        "nextPageToken": None,
        "items": [
            {
                "snippet": {
                    "topLevelComment": {
                        "snippet": {
                            "textOriginal": "second page comment",
                            "publishedAt": "2021-03-07T09:00:00Z",
                            "videoId": "vidB",
                            "authorDisplayName": "Eve",
                            "likeCount": 2,
                        }
                    }
                },
                "replies": None,
            }
        ],
    },
    # vidC: zero comments — no page at all (the reference's loop simply
    # appends nothing for it)
]

STATS_PAGES = [
    # counters as strings — the API quirk the normalizer must cast (F:370)
    {"video_id": "vidA", "items": [{"statistics": {
        "viewCount": "1000", "likeCount": "50", "dislikeCount": "2", "commentCount": "4"}}]},
    {"video_id": "vidB", "items": [{"statistics": {
        "viewCount": "200", "likeCount": "8", "dislikeCount": "0", "commentCount": "2"}}]},
    {"video_id": "vidC", "items": [{"statistics": {
        "viewCount": "31", "likeCount": "1", "dislikeCount": "0", "commentCount": "0"}}]},
]

SNIPPET_PAGES = [
    {"video_id": "vidA", "items": [{"snippet": {
        "description": "full description; of A é\\r end",
        "tags": ["tag one", "tag;two", "café"]}}]},
    {"video_id": "vidB", "items": [{"snippet": {
        "description": "full B",
        "tags": None}}]},  # missing tags -> [""] (P5)
    {"video_id": "vidC", "items": [{"snippet": {
        "description": "full C",
        "tags": ["solo"]}}]},
]


def write_fixtures(base_dir: str) -> dict[str, str]:
    """Write the four landing JSONL files; returns name->path."""
    paths = {}
    for name, pages in [
        ("search", SEARCH_PAGES),
        ("comments", COMMENT_PAGES),
        ("stats", STATS_PAGES),
        ("snippets", SNIPPET_PAGES),
    ]:
        path = os.path.join(base_dir, f"{name}.jsonl")
        with open(path, "w", encoding="utf-8") as fh:
            for page in pages:
                fh.write(json.dumps(page, ensure_ascii=False) + "\n")
        paths[name] = path
    return paths
