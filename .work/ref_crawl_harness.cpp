// Golden-crawl harness: links the UNMODIFIED reference crawl loop
// (/root/reference/src/Crawler.cpp + HtmlParser.cpp) against a stub
// http_get that serves a synthetic site from a file, so the Python oracle
// and Spark engine can be diffed against the reference's true crawl order.
//
// Usage: ref_crawl_harness <site.tsv> <hostname> <start_path> <max_pages>
//   site.tsv lines: <url>\t<base64 html>
// Output: lines "POP\t<path>" in dequeue order (parsed from the loop's own
// stdout is fragile — instead http_get logs each request), then
// "BOOK\t<b64 title>\t<b64 price>\t<b64 rating>\t<b64 url>" per collected
// book in order, then "END".
#include "/root/reference/include/HtmlParser.h"
#include "/root/reference/include/Crawler.h"
#include <fstream>
#include <iostream>
#include <map>
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

static std::map<std::string, std::string> g_pages;
static std::ofstream g_log;

// Stub for HttpClient.h's http_get: serve from the site map; missing URL →
// empty response (the reference's failed-fetch path). Logs each request —
// requests happen exactly in dequeue order.
std::string http_get(const std::string& hostname, const std::string& path) {
    g_log << "POP\t" << b64encode(path) << "\n";
    auto it = g_pages.find("http://" + hostname + path);
    if (it == g_pages.end()) return "";
    return "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + it->second;
}

std::string extract_body(const std::string& response) {
    // same as HttpClient.cpp:206-215
    size_t pos = response.find("\r\n\r\n");
    if (pos == std::string::npos) return response;
    return response.substr(pos + 4);
}

int main(int argc, char** argv) {
    if (argc < 6) {
        std::cerr << "usage: site.tsv host start max_pages outfile\n";
        return 2;
    }
    std::ifstream f(argv[1]);
    std::string line;
    while (std::getline(f, line)) {
        auto tab = line.find('\t');
        if (tab == std::string::npos) continue;
        g_pages[line.substr(0, tab)] = b64decode(line.substr(tab + 1));
    }
    g_log.open(argv[5]);
    auto books = crawl_website_queue(argv[2], argv[3], std::atoi(argv[4]));
    for (auto& b : books)
        g_log << "BOOK\t" << b64encode(b.title) << "\t" << b64encode(b.price)
              << "\t" << b64encode(b.rating) << "\t" << b64encode(b.url) << "\n";
    g_log << "END\n";
    g_log.close();
    return 0;
}
