"""GitHub repository-discovery source (S4) + stars sort (K5).

Mirrors the reference ``GitHubScraper``
(/root/reference/codesearch/indexer/repo_indexer.py:373-471): paged
``search/repositories`` queries built from ``stars:>=N language:<l>
topic:<t>``, sorted by stars descending, mapped to repo descriptor rows
(``full_name`` with ``/`` -> ``_``, clone URL, default branch, stars,
language), truncated to ``limit``.

The HTTP transport is INJECTABLE (``fetcher(url, headers) -> dict``): the
default stdlib-urllib transport needs network access (absent in this
sandbox — it raises a clear error), while tests drive the full paging /
mapping / sort logic through a fake fetcher.  No external HTTP library is
required either way.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional

API_URL = "https://api.github.com/search/repositories"


def _urllib_fetcher(url: str, headers: Dict[str, str]) -> dict:
    """Default transport: stdlib urllib (requires network access)."""
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:  # pragma: no cover
        return json.loads(resp.read())


class GitHubScraper:
    """Discover popular repositories to index (sorted by stars, K5)."""

    def __init__(
        self,
        token: Optional[str] = None,
        fetcher: Optional[Callable[[str, Dict[str, str]], dict]] = None,
    ):
        self.token = token
        self.fetcher = fetcher or _urllib_fetcher

    def _headers(self) -> Dict[str, str]:
        headers = {"Accept": "application/vnd.github.v3+json"}
        if self.token:
            headers["Authorization"] = f"token {self.token}"
        return headers

    def search_repos(
        self,
        language: Optional[str] = None,
        topic: Optional[str] = None,
        min_stars: int = 100,
        limit: int = 100,
    ) -> List[dict]:
        """Paged star-sorted repository search -> repo descriptor rows.

        Row shape mirrors the reference ``Repository`` model:
        ``{"name", "url", "branch", "stars", "language"}``.
        """
        query_parts = [f"stars:>={min_stars}"]
        if language:
            query_parts.append(f"language:{language}")
        if topic:
            query_parts.append(f"topic:{topic}")
        query = " ".join(query_parts)

        repos: List[dict] = []
        page = 1
        per_page = min(100, limit)
        headers = self._headers()
        while len(repos) < limit:
            url = (
                f"{API_URL}?q={query}&sort=stars&order=desc"
                f"&page={page}&per_page={per_page}"
            )
            try:
                data = self.fetcher(url, headers)
            except OSError:
                break  # the reference logs and stops on an API error
            items = data.get("items", [])
            if not items:
                break
            for item in items:
                repos.append(
                    {
                        "name": item["full_name"].replace("/", "_"),
                        "url": item["clone_url"],
                        "branch": item.get("default_branch", "main"),
                        "stars": item["stargazers_count"],
                        "language": item.get("language"),
                    }
                )
            page += 1
            if len(items) < per_page:
                break
        # K5: stars sort (the API already orders by stars; re-sort defends
        # against page-boundary drift), then truncate
        repos.sort(key=lambda r: -r["stars"])
        return repos[:limit]
