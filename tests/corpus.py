"""Conformance corpus: the reference crate's table-driven search tests.

Transcribed behavioral data (patterns / haystack / expected match triples)
from /root/reference/src/tests.rs:96-642. Each entry is
(name, patterns, haystack, [(pattern_index, start, end), ...]).
This corpus is the byte-for-byte parity acceptance gate for the framework.
"""

# Always true regardless of match semantics (tests.rs:96-152).
BASICS = [
    ("basic000", [], "", []),
    ("basic001", [""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("basic002", ["a"], "", []),
    ("basic010", ["a"], "a", [(0, 0, 1)]),
    ("basic020", ["a"], "aa", [(0, 0, 1), (0, 1, 2)]),
    ("basic030", ["a"], "aaa", [(0, 0, 1), (0, 1, 2), (0, 2, 3)]),
    ("basic040", ["a"], "aba", [(0, 0, 1), (0, 2, 3)]),
    ("basic050", ["a"], "bba", [(0, 2, 3)]),
    ("basic060", ["a"], "bbb", []),
    ("basic070", ["a"], "bababbbba", [(0, 1, 2), (0, 3, 4), (0, 8, 9)]),
    ("basic100", ["aa"], "", []),
    ("basic110", ["aa"], "aa", [(0, 0, 2)]),
    ("basic120", ["aa"], "aabbaa", [(0, 0, 2), (0, 4, 6)]),
    ("basic130", ["aa"], "abbab", []),
    ("basic140", ["aa"], "abbabaa", [(0, 5, 7)]),
    ("basic200", ["abc"], "abc", [(0, 0, 3)]),
    ("basic210", ["abc"], "zazabzabcz", [(0, 6, 9)]),
    ("basic220", ["abc"], "zazabczabcz", [(0, 3, 6), (0, 7, 10)]),
    ("basic300", ["a", "b"], "", []),
    ("basic310", ["a", "b"], "z", []),
    ("basic320", ["a", "b"], "b", [(1, 0, 1)]),
    ("basic330", ["a", "b"], "a", [(0, 0, 1)]),
    (
        "basic340",
        ["a", "b"],
        "abba",
        [(0, 0, 1), (1, 1, 2), (1, 2, 3), (0, 3, 4)],
    ),
    (
        "basic350",
        ["b", "a"],
        "abba",
        [(1, 0, 1), (0, 1, 2), (0, 2, 3), (1, 3, 4)],
    ),
    ("basic360", ["abc", "bc"], "xbc", [(1, 1, 3)]),
    ("basic400", ["foo", "bar"], "", []),
    ("basic410", ["foo", "bar"], "foobar", [(0, 0, 3), (1, 3, 6)]),
    ("basic420", ["foo", "bar"], "barfoo", [(1, 0, 3), (0, 3, 6)]),
    ("basic430", ["foo", "bar"], "foofoo", [(0, 0, 3), (0, 3, 6)]),
    ("basic440", ["foo", "bar"], "barbar", [(1, 0, 3), (1, 3, 6)]),
    ("basic450", ["foo", "bar"], "bafofoo", [(0, 4, 7)]),
    ("basic460", ["bar", "foo"], "bafofoo", [(1, 4, 7)]),
    ("basic470", ["foo", "bar"], "fobabar", [(1, 4, 7)]),
    ("basic480", ["bar", "foo"], "fobabar", [(0, 4, 7)]),
    ("basic600", [""], "", [(0, 0, 0)]),
    ("basic610", [""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("basic620", [""], "abc", [(0, 0, 0), (0, 1, 1), (0, 2, 2), (0, 3, 3)]),
    ("basic700", ["yabcdef", "abcdezghi"], "yabcdefghi", [(0, 0, 7)]),
    ("basic710", ["yabcdef", "abcdezghi"], "yabcdezghi", [(1, 1, 10)]),
    (
        "basic720",
        ["yabcdef", "bcdeyabc", "abcdezghi"],
        "yabcdezghi",
        [(2, 1, 10)],
    ),
]

# Anchored, always true regardless of semantics (tests.rs:158-172).
ANCHORED_BASICS = [
    ("abasic000", [], "", []),
    ("abasic001", [], "a", []),
    ("abasic002", [], "abc", []),
    ("abasic010", [""], "", [(0, 0, 0)]),
    ("abasic020", [""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("abasic030", [""], "abc", [(0, 0, 0), (0, 1, 1), (0, 2, 2), (0, 3, 3)]),
    ("abasic100", ["a"], "a", [(0, 0, 1)]),
    ("abasic110", ["a"], "aa", [(0, 0, 1), (0, 1, 2)]),
    ("abasic120", ["a", "b"], "ab", [(0, 0, 1), (1, 1, 2)]),
    ("abasic130", ["a", "b"], "ba", [(1, 0, 1), (0, 1, 2)]),
    ("abasic140", ["foo", "foofoo"], "foo", [(0, 0, 3)]),
    ("abasic150", ["foofoo", "foo"], "foo", [(1, 0, 3)]),
    ("abasic200", ["foo"], "foofoo foo", [(0, 0, 3), (0, 3, 6)]),
]

# Standard non-overlapping semantics (tests.rs:180-197).
STANDARD = [
    ("standard000", ["ab", "abcd"], "abcd", [(0, 0, 2)]),
    ("standard010", ["abcd", "ab"], "abcd", [(1, 0, 2)]),
    ("standard020", ["abcd", "ab", "abc"], "abcd", [(1, 0, 2)]),
    ("standard030", ["abcd", "abc", "ab"], "abcd", [(2, 0, 2)]),
    ("standard040", ["a", ""], "a", [(1, 0, 0), (1, 1, 1)]),
    (
        "standard400",
        ["abcd", "bcd", "cd", "b"],
        "abcd",
        [(3, 1, 2), (2, 2, 4)],
    ),
    ("standard410", ["", "a"], "a", [(0, 0, 0), (0, 1, 1)]),
    ("standard420", ["", "a"], "aa", [(0, 0, 0), (0, 1, 1), (0, 2, 2)]),
    ("standard430", ["", "a", ""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("standard440", ["a", "", ""], "a", [(1, 0, 0), (1, 1, 1)]),
    ("standard450", ["", "", "a"], "a", [(0, 0, 0), (0, 1, 1)]),
]

# Standard anchored (tests.rs:200-212).
STANDARD_ANCHORED = [
    ("astandard000", ["ab", "abcd"], "abcd", [(0, 0, 2)]),
    ("astandard010", ["abcd", "ab"], "abcd", [(1, 0, 2)]),
    ("astandard020", ["abcd", "ab", "abc"], "abcd", [(1, 0, 2)]),
    ("astandard030", ["abcd", "abc", "ab"], "abcd", [(2, 0, 2)]),
    ("astandard040", ["a", ""], "a", [(1, 0, 0), (1, 1, 1)]),
    ("astandard050", ["abcd", "bcd", "cd", "b"], "abcd", [(0, 0, 4)]),
    ("astandard410", ["", "a"], "a", [(0, 0, 0), (0, 1, 1)]),
    ("astandard420", ["", "a"], "aa", [(0, 0, 0), (0, 1, 1), (0, 2, 2)]),
    ("astandard430", ["", "a", ""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("astandard440", ["a", "", ""], "a", [(1, 0, 0), (1, 1, 1)]),
    ("astandard450", ["", "", "a"], "a", [(0, 0, 0), (0, 1, 1)]),
]

# Leftmost semantics shared by leftmost-first and leftmost-longest
# (tests.rs:218-268).
LEFTMOST = [
    ("leftmost000", ["ab", "ab"], "abcd", [(0, 0, 2)]),
    ("leftmost010", ["a", ""], "a", [(0, 0, 1)]),
    ("leftmost011", ["a", ""], "ab", [(0, 0, 1), (1, 2, 2)]),
    ("leftmost020", ["", ""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("leftmost030", ["a", "ab"], "aa", [(0, 0, 1), (0, 1, 2)]),
    ("leftmost031", ["ab", "a"], "aa", [(1, 0, 1), (1, 1, 2)]),
    ("leftmost032", ["ab", "a"], "xayabbbz", [(1, 1, 2), (0, 3, 5)]),
    ("leftmost300", ["abcd", "bce", "b"], "abce", [(1, 1, 4)]),
    ("leftmost310", ["abcd", "ce", "bc"], "abce", [(2, 1, 3)]),
    ("leftmost320", ["abcd", "bce", "ce", "b"], "abce", [(1, 1, 4)]),
    ("leftmost330", ["abcd", "bce", "cz", "bc"], "abcz", [(3, 1, 3)]),
    ("leftmost340", ["bce", "cz", "bc"], "bcz", [(2, 0, 2)]),
    ("leftmost350", ["abc", "bd", "ab"], "abd", [(2, 0, 2)]),
    (
        "leftmost360",
        ["abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(2, 0, 8)],
    ),
    (
        "leftmost370",
        ["abcdefghi", "cde", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8)],
    ),
    (
        "leftmost380",
        ["abcdefghi", "hz", "abcdefgh", "a"],
        "abcdefghz",
        [(2, 0, 8)],
    ),
    (
        "leftmost390",
        ["b", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8)],
    ),
    (
        "leftmost400",
        ["h", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8)],
    ),
    (
        "leftmost410",
        ["z", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8), (0, 8, 9)],
    ),
]

# Anchored leftmost (tests.rs:271-322).
ANCHORED_LEFTMOST = [
    ("aleftmost000", ["ab", "ab"], "abcd", [(0, 0, 2)]),
    ("aleftmost010", ["a", ""], "a", [(0, 0, 1)]),
    ("aleftmost020", ["", ""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("aleftmost030", ["a", "ab"], "aa", [(0, 0, 1), (0, 1, 2)]),
    ("aleftmost031", ["ab", "a"], "aa", [(1, 0, 1), (1, 1, 2)]),
    ("aleftmost032", ["ab", "a"], "xayabbbz", []),
    ("aleftmost300", ["abcd", "bce", "b"], "abce", []),
    ("aleftmost301", ["abcd", "bcd", "cd", "b"], "abcd", [(0, 0, 4)]),
    ("aleftmost310", ["abcd", "ce", "bc"], "abce", []),
    ("aleftmost320", ["abcd", "bce", "ce", "b"], "abce", []),
    ("aleftmost330", ["abcd", "bce", "cz", "bc"], "abcz", []),
    ("aleftmost340", ["bce", "cz", "bc"], "bcz", [(2, 0, 2)]),
    ("aleftmost350", ["abc", "bd", "ab"], "abd", [(2, 0, 2)]),
    (
        "aleftmost360",
        ["abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(2, 0, 8)],
    ),
    (
        "aleftmost370",
        ["abcdefghi", "cde", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8)],
    ),
    (
        "aleftmost380",
        ["abcdefghi", "hz", "abcdefgh", "a"],
        "abcdefghz",
        [(2, 0, 8)],
    ),
    (
        "aleftmost390",
        ["b", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8)],
    ),
    (
        "aleftmost400",
        ["h", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8)],
    ),
    (
        "aleftmost410",
        ["z", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghzyz",
        [(3, 0, 8), (0, 8, 9)],
    ),
]

# Leftmost-first specific (tests.rs:327-355).
LEFTMOST_FIRST = [
    ("leftfirst000", ["ab", "abcd"], "abcd", [(0, 0, 2)]),
    ("leftfirst010", ["", "a"], "a", [(0, 0, 0), (0, 1, 1)]),
    ("leftfirst011", ["", "a", ""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("leftfirst012", ["a", "", ""], "a", [(0, 0, 1)]),
    ("leftfirst013", ["", "", "a"], "a", [(0, 0, 0), (0, 1, 1)]),
    ("leftfirst014", ["a", ""], "a", [(0, 0, 1)]),
    ("leftfirst015", ["a", ""], "ab", [(0, 0, 1), (1, 2, 2)]),
    ("leftfirst020", ["abcd", "ab"], "abcd", [(0, 0, 4)]),
    ("leftfirst030", ["ab", "ab"], "abcd", [(0, 0, 2)]),
    ("leftfirst040", ["a", "ab"], "xayabbbz", [(0, 1, 2), (0, 3, 4)]),
    ("leftfirst100", ["abcdefg", "bcde", "bcdef"], "abcdef", [(1, 1, 5)]),
    ("leftfirst110", ["abcdefg", "bcdef", "bcde"], "abcdef", [(1, 1, 6)]),
    ("leftfirst300", ["abcd", "b", "bce"], "abce", [(1, 1, 2)]),
    (
        "leftfirst310",
        ["abcd", "b", "bce", "ce"],
        "abce",
        [(1, 1, 2), (3, 2, 4)],
    ),
    (
        "leftfirst320",
        ["a", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(0, 0, 1), (2, 7, 9)],
    ),
    ("leftfirst330", ["a", "abab"], "abab", [(0, 0, 1), (0, 2, 3)]),
    (
        "leftfirst400",
        ["amwix", "samwise", "sam"],
        "Zsamwix",
        [(2, 1, 4)],
    ),
]

# Anchored leftmost-first (tests.rs:358-379).
ANCHORED_LEFTMOST_FIRST = [
    ("aleftfirst000", ["ab", "abcd"], "abcd", [(0, 0, 2)]),
    ("aleftfirst010", ["", "a"], "a", [(0, 0, 0), (0, 1, 1)]),
    ("aleftfirst011", ["", "a", ""], "a", [(0, 0, 0), (0, 1, 1)]),
    ("aleftfirst012", ["a", "", ""], "a", [(0, 0, 1)]),
    ("aleftfirst013", ["", "", "a"], "a", [(0, 0, 0), (0, 1, 1)]),
    ("aleftfirst020", ["abcd", "ab"], "abcd", [(0, 0, 4)]),
    ("aleftfirst030", ["ab", "ab"], "abcd", [(0, 0, 2)]),
    ("aleftfirst040", ["a", "ab"], "xayabbbz", []),
    ("aleftfirst100", ["abcdefg", "bcde", "bcdef"], "abcdef", []),
    ("aleftfirst110", ["abcdefg", "bcdef", "bcde"], "abcdef", []),
    ("aleftfirst300", ["abcd", "b", "bce"], "abce", []),
    ("aleftfirst310", ["abcd", "b", "bce", "ce"], "abce", []),
    (
        "aleftfirst320",
        ["a", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(0, 0, 1)],
    ),
    ("aleftfirst330", ["a", "abab"], "abab", [(0, 0, 1)]),
    ("aleftfirst400", ["wise", "samwise", "sam"], "samwix", [(2, 0, 3)]),
]

# Leftmost-longest specific (tests.rs:384-409).
LEFTMOST_LONGEST = [
    ("leftlong000", ["ab", "abcd"], "abcd", [(1, 0, 4)]),
    ("leftlong010", ["abcd", "bcd", "cd", "b"], "abcd", [(0, 0, 4)]),
    ("leftlong020", ["", "a"], "a", [(1, 0, 1)]),
    ("leftlong021", ["", "a", ""], "a", [(1, 0, 1)]),
    ("leftlong022", ["a", "", ""], "a", [(0, 0, 1)]),
    ("leftlong023", ["", "", "a"], "a", [(2, 0, 1)]),
    ("leftlong024", ["", "a"], "ab", [(1, 0, 1), (0, 2, 2)]),
    ("leftlong030", ["", "a"], "aa", [(1, 0, 1), (1, 1, 2)]),
    ("leftlong040", ["a", "ab"], "a", [(0, 0, 1)]),
    ("leftlong050", ["a", "ab"], "ab", [(1, 0, 2)]),
    ("leftlong060", ["ab", "a"], "a", [(1, 0, 1)]),
    ("leftlong070", ["ab", "a"], "ab", [(0, 0, 2)]),
    ("leftlong100", ["abcdefg", "bcde", "bcdef"], "abcdef", [(2, 1, 6)]),
    ("leftlong110", ["abcdefg", "bcdef", "bcde"], "abcdef", [(1, 1, 6)]),
    ("leftlong300", ["abcd", "b", "bce"], "abce", [(2, 1, 4)]),
    (
        "leftlong310",
        ["a", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8)],
    ),
    ("leftlong320", ["a", "abab"], "abab", [(1, 0, 4)]),
    ("leftlong330", ["abcd", "b", "ce"], "abce", [(1, 1, 2), (2, 2, 4)]),
    ("leftlong340", ["a", "ab"], "xayabbbz", [(0, 1, 2), (1, 3, 5)]),
]

# Anchored leftmost-longest (tests.rs:412-436).
ANCHORED_LEFTMOST_LONGEST = [
    ("aleftlong000", ["ab", "abcd"], "abcd", [(1, 0, 4)]),
    ("aleftlong010", ["abcd", "bcd", "cd", "b"], "abcd", [(0, 0, 4)]),
    ("aleftlong020", ["", "a"], "a", [(1, 0, 1)]),
    ("aleftlong021", ["", "a", ""], "a", [(1, 0, 1)]),
    ("aleftlong022", ["a", "", ""], "a", [(0, 0, 1)]),
    ("aleftlong023", ["", "", "a"], "a", [(2, 0, 1)]),
    ("aleftlong030", ["", "a"], "aa", [(1, 0, 1), (1, 1, 2)]),
    ("aleftlong040", ["a", "ab"], "a", [(0, 0, 1)]),
    ("aleftlong050", ["a", "ab"], "ab", [(1, 0, 2)]),
    ("aleftlong060", ["ab", "a"], "a", [(1, 0, 1)]),
    ("aleftlong070", ["ab", "a"], "ab", [(0, 0, 2)]),
    ("aleftlong100", ["abcdefg", "bcde", "bcdef"], "abcdef", []),
    ("aleftlong110", ["abcdefg", "bcdef", "bcde"], "abcdef", []),
    ("aleftlong300", ["abcd", "b", "bce"], "abce", []),
    (
        "aleftlong310",
        ["a", "abcdefghi", "hz", "abcdefgh"],
        "abcdefghz",
        [(3, 0, 8)],
    ),
    ("aleftlong320", ["a", "abab"], "abab", [(1, 0, 4)]),
    ("aleftlong330", ["abcd", "b", "ce"], "abce", []),
    ("aleftlong340", ["a", "ab"], "xayabbbz", []),
]

# Non-overlapping, valid for standard and leftmost (tests.rs:442-455).
NON_OVERLAPPING = [
    ("nover010", ["abcd", "bcd", "cd"], "abcd", [(0, 0, 4)]),
    ("nover020", ["bcd", "cd", "abcd"], "abcd", [(2, 0, 4)]),
    ("nover030", ["abc", "bc"], "zazabcz", [(0, 3, 6)]),
    (
        "nover100",
        ["ab", "ba"],
        "abababa",
        [(0, 0, 2), (0, 2, 4), (0, 4, 6)],
    ),
    ("nover200", ["foo", "foo"], "foobarfoo", [(0, 0, 3), (0, 6, 9)]),
    ("nover300", ["", ""], "", [(0, 0, 0)]),
    ("nover310", ["", ""], "a", [(0, 0, 0), (0, 1, 1)]),
]

# Anchored non-overlapping (tests.rs:458-471).
ANCHORED_NON_OVERLAPPING = [
    ("anover010", ["abcd", "bcd", "cd"], "abcd", [(0, 0, 4)]),
    ("anover020", ["bcd", "cd", "abcd"], "abcd", [(2, 0, 4)]),
    ("anover030", ["abc", "bc"], "zazabcz", []),
    (
        "anover100",
        ["ab", "ba"],
        "abababa",
        [(0, 0, 2), (0, 2, 4), (0, 4, 6)],
    ),
    ("anover200", ["foo", "foo"], "foobarfoo", [(0, 0, 3)]),
    ("anover300", ["", ""], "", [(0, 0, 0)]),
    ("anover310", ["", ""], "a", [(0, 0, 0), (0, 1, 1)]),
]

# Overlapping, standard semantics only (tests.rs:477-553).
OVERLAPPING = [
    (
        "over000",
        ["abcd", "bcd", "cd", "b"],
        "abcd",
        [(3, 1, 2), (0, 0, 4), (1, 1, 4), (2, 2, 4)],
    ),
    (
        "over010",
        ["bcd", "cd", "b", "abcd"],
        "abcd",
        [(2, 1, 2), (3, 0, 4), (0, 1, 4), (1, 2, 4)],
    ),
    (
        "over020",
        ["abcd", "bcd", "cd"],
        "abcd",
        [(0, 0, 4), (1, 1, 4), (2, 2, 4)],
    ),
    (
        "over030",
        ["bcd", "abcd", "cd"],
        "abcd",
        [(1, 0, 4), (0, 1, 4), (2, 2, 4)],
    ),
    (
        "over040",
        ["bcd", "cd", "abcd"],
        "abcd",
        [(2, 0, 4), (0, 1, 4), (1, 2, 4)],
    ),
    ("over050", ["abc", "bc"], "zazabcz", [(0, 3, 6), (1, 4, 6)]),
    (
        "over100",
        ["ab", "ba"],
        "abababa",
        [(0, 0, 2), (1, 1, 3), (0, 2, 4), (1, 3, 5), (0, 4, 6), (1, 5, 7)],
    ),
    (
        "over200",
        ["foo", "foo"],
        "foobarfoo",
        [(0, 0, 3), (1, 0, 3), (0, 6, 9), (1, 6, 9)],
    ),
    ("over300", ["", ""], "", [(0, 0, 0), (1, 0, 0)]),
    (
        "over310",
        ["", ""],
        "a",
        [(0, 0, 0), (1, 0, 0), (0, 1, 1), (1, 1, 1)],
    ),
    ("over320", ["", "a"], "a", [(0, 0, 0), (1, 0, 1), (0, 1, 1)]),
    (
        "over330",
        ["", "a", ""],
        "a",
        [(0, 0, 0), (2, 0, 0), (1, 0, 1), (0, 1, 1), (2, 1, 1)],
    ),
    (
        "over340",
        ["a", "", ""],
        "a",
        [(1, 0, 0), (2, 0, 0), (0, 0, 1), (1, 1, 1), (2, 1, 1)],
    ),
    (
        "over350",
        ["", "", "a"],
        "a",
        [(0, 0, 0), (1, 0, 0), (2, 0, 1), (0, 1, 1), (1, 1, 1)],
    ),
    (
        "over360",
        ["foo", "foofoo"],
        "foofoo",
        [(0, 0, 3), (1, 0, 6), (0, 3, 6)],
    ),
]

# ASCII case insensitivity (tests.rs:582-609).
ASCII_CASE_INSENSITIVE = [
    ("acasei000", ["a"], "A", [(0, 0, 1)]),
    ("acasei010", ["Samwise"], "SAMWISE", [(0, 0, 7)]),
    ("acasei011", ["Samwise"], "SAMWISE.abcd", [(0, 0, 7)]),
    ("acasei020", ["fOoBaR"], "quux foobar baz", [(0, 5, 11)]),
]

ASCII_CASE_INSENSITIVE_NON_OVERLAPPING = [
    ("acaseino000", ["foo", "FOO"], "fOo", [(0, 0, 3)]),
    ("acaseino001", ["FOO", "foo"], "fOo", [(0, 0, 3)]),
    ("acaseino010", ["abc", "def"], "abcdef", [(0, 0, 3), (1, 3, 6)]),
]

ASCII_CASE_INSENSITIVE_OVERLAPPING = [
    ("acaseio000", ["foo", "FOO"], "fOo", [(0, 0, 3), (1, 0, 3)]),
    ("acaseio001", ["FOO", "foo"], "fOo", [(0, 0, 3), (1, 0, 3)]),
    # Regression: github.com/BurntSushi/aho-corasick/issues/68
    (
        "acaseio010",
        ["abc", "def", "abcdef"],
        "abcdef",
        [(0, 0, 3), (2, 0, 6), (1, 3, 6)],
    ),
]

# Regression tests (tests.rs:615-642).
REGRESSION = [
    ("regression010", ["inf", "ind"], "infind", [(0, 0, 3), (1, 3, 6)]),
    ("regression020", ["ind", "inf"], "infind", [(1, 0, 3), (0, 3, 6)]),
    (
        "regression030",
        ["libcore/", "libstd/"],
        "libcore/char/methods.rs",
        [(0, 0, 8)],
    ),
    (
        "regression040",
        ["libstd/", "libcore/"],
        "libcore/char/methods.rs",
        [(1, 0, 8)],
    ),
    (
        "regression050",
        ["\x00\x00\x01", "\x00\x00\x00"],
        "\x00\x00\x00",
        [(1, 0, 3)],
    ),
    (
        "regression060",
        ["\x00\x00\x00", "\x00\x00\x01"],
        "\x00\x00\x00",
        [(0, 0, 3)],
    ),
]

# Collections mirroring tests.rs:47-88.
AC_STANDARD_NON_OVERLAPPING = [BASICS, NON_OVERLAPPING, STANDARD, REGRESSION]
AC_STANDARD_ANCHORED_NON_OVERLAPPING = [
    ANCHORED_BASICS,
    ANCHORED_NON_OVERLAPPING,
    STANDARD_ANCHORED,
]
AC_STANDARD_OVERLAPPING = [BASICS, OVERLAPPING, REGRESSION]
AC_LEFTMOST_FIRST = [
    BASICS,
    NON_OVERLAPPING,
    LEFTMOST,
    LEFTMOST_FIRST,
    REGRESSION,
]
AC_LEFTMOST_FIRST_ANCHORED = [
    ANCHORED_BASICS,
    ANCHORED_NON_OVERLAPPING,
    ANCHORED_LEFTMOST,
    ANCHORED_LEFTMOST_FIRST,
]
AC_LEFTMOST_LONGEST = [
    BASICS,
    NON_OVERLAPPING,
    LEFTMOST,
    LEFTMOST_LONGEST,
    REGRESSION,
]
AC_LEFTMOST_LONGEST_ANCHORED = [
    ANCHORED_BASICS,
    ANCHORED_NON_OVERLAPPING,
    ANCHORED_LEFTMOST,
    ANCHORED_LEFTMOST_LONGEST,
]


def iter_tests(collection):
    for group in collection:
        for name, patterns, haystack, matches in group:
            yield name, patterns, haystack, matches
