// Differential-test harness: links the UNMODIFIED reference parser
// (/root/reference/src/HtmlParser.cpp) and prints its outputs for inputs
// read from stdin, so the Python kernels can be compared byte-for-byte.
// Protocol: each request is "<op>\t<base64 html>\t<arg...>\n"; response is
// one line of tab-separated base64 fields.
#include "/root/reference/include/HtmlParser.h"
std::string parse_rating(const std::string& rating_class);  // defined in HtmlParser.cpp, not in header
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

static const std::string B64 =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

std::string b64decode(const std::string& in) {
    std::string out;
    std::vector<int> T(256, -1);
    for (int i = 0; i < 64; i++) T[(unsigned char)B64[i]] = i;
    int val = 0, valb = -8;
    for (unsigned char c : in) {
        if (T[c] == -1) break;
        val = (val << 6) + T[c];
        valb += 6;
        if (valb >= 0) { out.push_back(char((val >> valb) & 0xFF)); valb -= 8; }
    }
    return out;
}

std::string b64encode(const std::string& in) {
    std::string out;
    int val = 0, valb = -6;
    for (unsigned char c : in) {
        val = (val << 8) + c;
        valb += 8;
        while (valb >= 0) { out.push_back(B64[(val >> valb) & 0x3F]); valb -= 6; }
    }
    if (valb > -6) out.push_back(B64[((val << 8) >> (valb + 8)) & 0x3F]);
    while (out.size() % 4) out.push_back('=');
    return out;
}

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        std::istringstream ss(line);
        std::string op, a1, a2, a3;
        std::getline(ss, op, '\t');
        std::getline(ss, a1, '\t');
        std::getline(ss, a2, '\t');
        std::getline(ss, a3, '\t');
        a1 = b64decode(a1); a2 = b64decode(a2); a3 = b64decode(a3);
        if (op == "parse_books") {
            auto books = parse_books(a1, a2);
            for (auto& b : books)
                std::cout << b64encode(b.title) << ":" << b64encode(b.price) << ":"
                          << b64encode(b.rating) << ":" << b64encode(b.url) << "\t";
            std::cout << "\n";
        } else if (op == "parse_book_page") {
            Book b = parse_book_page(a1, a2, a3);
            std::cout << b64encode(b.title) << ":" << b64encode(b.price) << ":"
                      << b64encode(b.rating) << ":" << b64encode(b.url) << "\n";
        } else if (op == "extract_all_links") {
            for (auto& l : extract_all_links(a1, a2)) std::cout << b64encode(l) << "\t";
            std::cout << "\n";
        } else if (op == "normalize_url") {
            std::cout << b64encode(normalize_url(a1, a2)) << "\n";
        } else if (op == "canonicalize_url") {
            std::cout << b64encode(canonicalize_url(a1)) << "\n";
        } else if (op == "find_next_link") {
            std::cout << b64encode(find_next_link(a1)) << "\n";
        } else if (op == "extract_between") {
            std::cout << b64encode(extract_between(a1, a2, a3)) << "\n";
        } else if (op == "parse_rating") {
            std::cout << b64encode(parse_rating(a1)) << "\n";
        } else if (op == "predicates") {
            std::cout << (is_book_page(a1) ? 1 : 0) << ":"
                      << (is_category_page(a1) ? 1 : 0) << ":"
                      << (should_ignore_url(a1) ? 1 : 0) << "\n";
        } else {
            std::cout << "ERR unknown op\n";
        }
        std::cout.flush();
    }
    return 0;
}
