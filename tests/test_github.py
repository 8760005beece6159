"""GitHub discovery source (S4) + stars sort (K5) — full paging/mapping
logic driven through a fake transport (no network in this sandbox)."""

from urllib.parse import parse_qs, urlparse

import pytest

from distributedcodesearchengine_ray.sources.github import GitHubScraper


def _fake_repo(i, stars, lang="Python"):
    return {
        "full_name": f"org{i}/repo{i}",
        "clone_url": f"https://github.com/org{i}/repo{i}.git",
        "default_branch": "main" if i % 2 == 0 else "master",
        "stargazers_count": stars,
        "language": lang,
    }


def test_paged_search_maps_and_sorts():
    pages = {
        1: [_fake_repo(i, 1000 - i) for i in range(100)],
        2: [_fake_repo(100 + i, 900 - i) for i in range(40)],
    }
    seen_urls = []

    def fetcher(url, headers):
        seen_urls.append(url)
        q = parse_qs(urlparse(url).query)
        assert q["sort"] == ["stars"] and q["order"] == ["desc"]
        assert "stars:>=200" in q["q"][0] and "language:python" in q["q"][0]
        return {"items": pages.get(int(q["page"][0]), [])}

    s = GitHubScraper(fetcher=fetcher)
    repos = s.search_repos(language="python", min_stars=200, limit=120)
    assert len(repos) == 120
    assert len(seen_urls) == 2  # paged until limit satisfied
    # stars sort (K5) + name mapping (full_name '/' -> '_')
    stars = [r["stars"] for r in repos]
    assert stars == sorted(stars, reverse=True)
    assert repos[0]["name"] == "org0_repo0"
    assert repos[0]["url"].endswith("repo0.git")
    assert {r["branch"] for r in repos} == {"main", "master"}


def test_topic_and_token_headers():
    captured = {}

    def fetcher(url, headers):
        captured["headers"] = headers
        captured["q"] = parse_qs(urlparse(url).query)["q"][0]
        return {"items": [_fake_repo(1, 500)]}

    s = GitHubScraper(token="tok123", fetcher=fetcher)
    repos = s.search_repos(topic="machine-learning", min_stars=50, limit=10)
    assert len(repos) == 1
    assert captured["headers"]["Authorization"] == "token tok123"
    assert "topic:machine-learning" in captured["q"]
    assert "stars:>=50" in captured["q"]


def test_api_error_stops_cleanly():
    def fetcher(url, headers):
        raise OSError("rate limited")

    assert GitHubScraper(fetcher=fetcher).search_repos(limit=5) == []


def test_empty_page_stops():
    def fetcher(url, headers):
        return {"items": []}

    assert GitHubScraper(fetcher=fetcher).search_repos(limit=5) == []
