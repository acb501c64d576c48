"""Substitution dictionaries for Korean text normalization.

Plays the role of the reference's ``text/ko_dictionary.py`` (etc_dictionary +
english_dictionary): literal phrase rewrites applied before jamo decomposition.
The tables here are a freshly curated starter set — users with corpus-specific
vocabulary extend them (or pass their own dicts to
``tacotron_tpu.text.korean.normalize``).
"""

# Miscellaneous literal rewrites: symbols, counters written with ASCII, common
# loanword spellings that the rule-based normalizer would otherwise mangle.
etc_dictionary = {
    "2 30대": "이삼십대",
    "20~30대": "이삼십대",
    "1+1": "원플러스원",
    "+": "플러스",
    "CCTV": "씨씨티비",
    "IMF": "아이엠에프",
    "TV": "티비",
    "PC": "피씨",
    "SNS": "에스엔에스",
    "No.": "넘버",
    "㈜": "주식회사",
    "%p": "퍼센트포인트",
    "㎞": "킬로미터",
    "㎏": "킬로그람",
    "㎝": "센치미터",
}

# English word -> Korean transliteration for words that commonly appear
# verbatim inside Korean corpora.
english_dictionary = {
    "Hello": "헬로",
    "hello": "헬로",
    "news": "뉴스",
    "News": "뉴스",
    "JTBC": "제이티비씨",
    "KBS": "케이비에스",
    "MBC": "엠비씨",
    "SBS": "에스비에스",
    "YTN": "와이티엔",
    "Google": "구글",
    "google": "구글",
    "Facebook": "페이스북",
    "facebook": "페이스북",
    "Twitter": "트위터",
    "twitter": "트위터",
    "YouTube": "유튜브",
    "youtube": "유튜브",
    "Apple": "애플",
    "Samsung": "삼성",
    "Olympic": "올림픽",
    "olympic": "올림픽",
    "smartphone": "스마트폰",
    "Internet": "인터넷",
    "internet": "인터넷",
    "AI": "에이아이",
    "IT": "아이티",
    "OK": "오케이",
    "ok": "오케이",
}
