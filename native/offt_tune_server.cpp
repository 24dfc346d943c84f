// offt-tpu native tuning server.
//
// C++ re-expression of Active Harmony's hserver
// (/root/reference/activeharmony/build/hserver.c): a TCP server owning
// search sessions that remote clients join/fetch/report against, with an
// HTTP monitoring endpoint served from the SAME port by protocol sniffing
// (hserver classifies connections by peeking for HMESG_MAGIC,
// hserver.c:413-460; we peek for an HTTP method token). Strategies run the
// shared native Engine (engine.hpp) instead of dlopen'd .so plugins.
//
// Wire protocol: JSON-lines, identical to the Python service
// (offt_tpu/tune/service.py) so offt_tpu.tune.client.ServiceClient works
// against either. Sessions here are index-space only: dimension VALUES are
// kept client-side; the server sees per-dimension grid sizes (the same
// V00..Vnn int-index convention as the reference, offt-tuning.c:779-786).
//
// Build: g++ -O2 -std=c++17 -pthread -o offt-tune-server offt_tune_server.cpp

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cmath>
#include <cctype>
#include <chrono>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <set>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include "engine.hpp"

namespace {

using offt_tune::Engine;

// ---------------------------------------------------------------------
// minimal JSON helpers for our flat message shape (no external deps)
// ---------------------------------------------------------------------

// Parse the JSON string literal whose opening '"' is at s[pos]; handles
// backslash escapes (\" \\ \/ \b \f \n \r \t \uXXXX) so values produced
// by json.dumps round-trip identically to the Python server. On success
// *out holds the unescaped text and *end_out the index one past the
// closing quote.
bool json_parse_string(const std::string& s, size_t pos, std::string* out,
                       size_t* end_out = nullptr) {
  if (pos >= s.size() || s[pos] != '"') return false;
  std::string val;
  size_t i = pos + 1;
  while (i < s.size()) {
    char c = s[i];
    if (c == '"') {
      *out = std::move(val);
      if (end_out) *end_out = i + 1;
      return true;
    }
    if (c != '\\') {
      val += c;
      ++i;
      continue;
    }
    if (i + 1 >= s.size()) return false;  // dangling backslash
    char e = s[i + 1];
    switch (e) {
      case '"': val += '"'; i += 2; break;
      case '\\': val += '\\'; i += 2; break;
      case '/': val += '/'; i += 2; break;
      case 'b': val += '\b'; i += 2; break;
      case 'f': val += '\f'; i += 2; break;
      case 'n': val += '\n'; i += 2; break;
      case 'r': val += '\r'; i += 2; break;
      case 't': val += '\t'; i += 2; break;
      case 'u': {
        if (i + 6 > s.size()) return false;
        unsigned cp = 0;
        for (int k = 0; k < 4; ++k) {
          char h = s[i + 2 + k];
          cp <<= 4;
          if (h >= '0' && h <= '9') cp |= (unsigned)(h - '0');
          else if (h >= 'a' && h <= 'f') cp |= (unsigned)(h - 'a' + 10);
          else if (h >= 'A' && h <= 'F') cp |= (unsigned)(h - 'A' + 10);
          else return false;
        }
        i += 6;
        // surrogate pair -> one code point
        if (cp >= 0xD800 && cp <= 0xDBFF && i + 6 <= s.size() &&
            s[i] == '\\' && s[i + 1] == 'u') {
          unsigned lo = 0;
          bool ok = true;
          for (int k = 0; k < 4; ++k) {
            char h = s[i + 2 + k];
            lo <<= 4;
            if (h >= '0' && h <= '9') lo |= (unsigned)(h - '0');
            else if (h >= 'a' && h <= 'f') lo |= (unsigned)(h - 'a' + 10);
            else if (h >= 'A' && h <= 'F') lo |= (unsigned)(h - 'A' + 10);
            else { ok = false; break; }
          }
          if (ok && lo >= 0xDC00 && lo <= 0xDFFF) {
            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
            i += 6;
          }
        }
        // UTF-8 encode
        if (cp < 0x80) {
          val += (char)cp;
        } else if (cp < 0x800) {
          val += (char)(0xC0 | (cp >> 6));
          val += (char)(0x80 | (cp & 0x3F));
        } else if (cp < 0x10000) {
          val += (char)(0xE0 | (cp >> 12));
          val += (char)(0x80 | ((cp >> 6) & 0x3F));
          val += (char)(0x80 | (cp & 0x3F));
        } else {
          val += (char)(0xF0 | (cp >> 18));
          val += (char)(0x80 | ((cp >> 12) & 0x3F));
          val += (char)(0x80 | ((cp >> 6) & 0x3F));
          val += (char)(0x80 | (cp & 0x3F));
        }
        break;
      }
      default:
        return false;  // invalid escape
    }
  }
  return false;  // unterminated
}

std::string json_get_string(const std::string& s, const std::string& key) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return "";
  pos = s.find(':', pos);
  if (pos == std::string::npos) return "";
  ++pos;
  while (pos < s.size() && std::isspace((unsigned char)s[pos])) ++pos;
  std::string out;
  if (!json_parse_string(s, pos, &out)) return "";
  return out;
}

// like json_get_string, but distinguishes a present string value from an
// absent key / JSON null (needed for setcfg: value=null means ERASE,
// value="" means set-to-empty — harmony_inform's val=NULL semantics,
// hclient.h:106-128)
bool json_get_string_opt(const std::string& s, const std::string& key,
                         std::string* out) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return false;
  pos = s.find(':', pos);
  if (pos == std::string::npos) return false;
  ++pos;
  while (pos < s.size() && std::isspace((unsigned char)s[pos])) ++pos;
  return json_parse_string(s, pos, out);  // false on null / non-string
}

// Parse the flat string->string object at "<key>": {...} (the session
// descriptor's "cfg" field — Session(..., cfg=...) parity with the
// Python server). Values must be JSON strings, as ServiceClient sends.
bool json_get_string_map(const std::string& s, const std::string& key,
                         std::vector<std::pair<std::string, std::string>>* out) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return false;
  pos = s.find(':', pos);
  if (pos == std::string::npos) return false;
  ++pos;
  while (pos < s.size() && std::isspace((unsigned char)s[pos])) ++pos;
  if (pos >= s.size() || s[pos] != '{') return false;
  ++pos;
  out->clear();
  while (pos < s.size()) {
    while (pos < s.size() &&
           (std::isspace((unsigned char)s[pos]) || s[pos] == ','))
      ++pos;
    if (pos < s.size() && s[pos] == '}') return true;
    std::string k, v;
    size_t after = 0;
    if (!json_parse_string(s, pos, &k, &after)) return false;
    pos = after;
    while (pos < s.size() && std::isspace((unsigned char)s[pos])) ++pos;
    if (pos >= s.size() || s[pos] != ':') return false;
    ++pos;
    while (pos < s.size() && std::isspace((unsigned char)s[pos])) ++pos;
    if (!json_parse_string(s, pos, &v, &after)) return false;
    pos = after;
    out->emplace_back(std::move(k), std::move(v));
  }
  return false;  // unterminated object
}

bool json_get_number(const std::string& s, const std::string& key,
                     double* out) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return false;
  pos = s.find(':', pos);
  if (pos == std::string::npos) return false;
  ++pos;
  try {
    size_t used = 0;
    *out = std::stod(s.substr(pos), &used);
    return used > 0;
  } catch (...) {
    return false;
  }
}

// first top-level array value for key: [1, 2, 3]
bool json_get_int_array(const std::string& s, const std::string& key,
                        std::vector<int>* out) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return false;
  pos = s.find('[', pos);
  if (pos == std::string::npos) return false;
  auto end = s.find(']', pos);
  if (end == std::string::npos) return false;
  out->clear();
  std::string body = s.substr(pos + 1, end - pos - 1);
  std::stringstream ss(body);
  std::string tok;
  while (std::getline(ss, tok, ',')) {
    try {
      out->push_back(std::stoi(tok));
    } catch (...) {
      return false;
    }
  }
  return true;
}

// count elements of every "values": [...] array under "dims" (the Python
// client sends full value lists; the engine only needs grid sizes)
std::vector<int> json_dims_sizes(const std::string& s) {
  std::vector<int> sizes;
  size_t pos = 0;
  while ((pos = s.find("\"values\"", pos)) != std::string::npos) {
    auto open = s.find('[', pos);
    if (open == std::string::npos) break;
    auto close = s.find(']', open);
    if (close == std::string::npos) break;
    int count = 1;
    bool empty = true;
    for (size_t i = open + 1; i < close; ++i) {
      if (!std::isspace((unsigned char)s[i])) empty = false;
      if (s[i] == ',') ++count;
    }
    sizes.push_back(empty ? 0 : count);
    pos = close;
  }
  return sizes;
}

std::string html_escape(const std::string& s) {
  std::string out;
  out.reserve(s.size());
  for (char c : s) {
    switch (c) {
      case '&': out += "&amp;"; break;
      case '<': out += "&lt;"; break;
      case '>': out += "&gt;"; break;
      case '"': out += "&quot;"; break;
      case '\'': out += "&#39;"; break;
      default: out += c;
    }
  }
  return out;
}

std::string json_escape(const std::string& s) {
  std::string out;
  out.reserve(s.size());
  for (char c : s) {
    if (c == '"' || c == '\\') {
      out += '\\';
      out += c;
    } else if ((unsigned char)c < 0x20) {
      char buf[8];
      snprintf(buf, sizeof(buf), "\\u%04x", c);
      out += buf;
    } else {
      out += c;
    }
  }
  return out;
}

std::string int_array_json(const std::vector<int>& v) {
  std::string out = "[";
  for (size_t i = 0; i < v.size(); ++i) {
    if (i) out += ", ";
    out += std::to_string(v[i]);
  }
  return out + "]";
}

// ---------------------------------------------------------------------
// sessions
// ---------------------------------------------------------------------

struct Session {
  int id;
  std::string name;
  std::unique_ptr<Engine> engine;
  std::mutex mu;
  int ndims = 0;
  long trials = 0;
  bool left = false;  // client detached; retained for the UI, evictable
  double best_perf = std::numeric_limits<double>::infinity();
  std::vector<std::pair<double, double>> history;  // (t, perf) for the UI
  // points issued but not yet reported: distinguishes a strategy that is
  // WAITING on another client's report (multi-client mid-round) from a
  // truly exhausted one, and gates stale duplicate reports off the
  // engine (Python-server Session parity; harmony_join multi-client
  // flow, hclient.c:156-233)
  std::set<std::vector<int>> outstanding;
  // runtime config database (harmony_query/harmony_inform,
  // hclient.h:95-128 / session-core.c:927-935): in-memory string KV.
  // Live keys: STRATEGY_CONVERGED reflects the engine; truthy PAUSED
  // makes fetch return BUSY.
  std::map<std::string, std::string> cfg;
};

class Server {
 public:
  Server(const char* host, int port) {
    fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
    int yes = 1;
    setsockopt(fd_, SOL_SOCKET, SO_REUSEADDR, &yes, sizeof(yes));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(port);
    inet_pton(AF_INET, host, &addr.sin_addr);
    if (bind(fd_, (sockaddr*)&addr, sizeof(addr)) != 0) {
      perror("bind");
      exit(1);
    }
    listen(fd_, 64);
    socklen_t len = sizeof(addr);
    getsockname(fd_, (sockaddr*)&addr, &len);
    port_ = ntohs(addr.sin_port);
  }

  int port() const { return port_; }

  void serve() {
    while (true) {
      int cfd = accept(fd_, nullptr, nullptr);
      if (cfd < 0) continue;
      std::thread(&Server::handle, this, cfd).detach();
    }
  }

 private:
  void handle(int cfd) {
    char peek[8] = {0};
    ssize_t n = recv(cfd, peek, sizeof(peek), MSG_PEEK);
    if (n <= 0) {
      close(cfd);
      return;
    }
    if (!strncmp(peek, "GET ", 4) || !strncmp(peek, "HEAD", 4) ||
        !strncmp(peek, "POST", 4)) {
      handle_http(cfd);
    } else {
      handle_client(cfd);
    }
    close(cfd);
  }

  // ---- JSON-lines tuning protocol (one request per line) -------------
  static constexpr size_t kMaxLine = 1 << 20;  // 1 MiB pending-line cap

  void handle_client(int cfd) {
    std::string buf;
    char chunk[4096];
    while (true) {
      auto nl = buf.find('\n');
      if (nl == std::string::npos) {
        if (buf.size() > kMaxLine) return;  // misbehaving client: drop
        ssize_t n = recv(cfd, chunk, sizeof(chunk), 0);
        if (n <= 0) return;
        buf.append(chunk, n);
        continue;
      }
      std::string line = buf.substr(0, nl);
      buf.erase(0, nl + 1);
      if (line.find_first_not_of(" \t\r") == std::string::npos) continue;
      std::string reply = dispatch(line);
      reply += "\n";
      if (send(cfd, reply.data(), reply.size(), MSG_NOSIGNAL) < 0) return;
    }
  }

  std::string dispatch(const std::string& msg) {
    std::string op = json_get_string(msg, "op");
    if (op == "session") {
      std::vector<int> sizes = json_dims_sizes(msg);
      if (sizes.empty()) json_get_int_array(msg, "sizes", &sizes);
      for (int v : sizes)
        if (v <= 0) return R"({"status": "FAIL", "error": "empty dim"})";
      if (sizes.empty())
        return R"({"status": "FAIL", "error": "no dims"})";
      std::string strat = json_get_string(msg, "strategy");
      if (strat.empty()) strat = "nm";
      double seed = 0;
      json_get_number(msg, "seed", &seed);
      auto sess = std::make_shared<Session>();
      std::lock_guard<std::mutex> lk(mu_);
      sess->id = next_id_++;
      sess->name = json_get_string(msg, "name");
      if (sess->name.empty()) sess->name = "session-" + std::to_string(sess->id);
      sess->ndims = (int)sizes.size();
      sess->engine = std::make_unique<Engine>(strat, sizes,
                                              (unsigned)seed, 0, nullptr);
      sess->cfg["SESSION_STRATEGY"] = strat;
      sess->cfg["RANDOM_SEED"] = std::to_string((long)seed);
      // seed runtime config from the session descriptor (Python-server
      // parity: Session(..., cfg=msg.get("cfg")))
      std::vector<std::pair<std::string, std::string>> seeded;
      if (json_get_string_map(msg, "cfg", &seeded))
        for (auto& kv : seeded) sess->cfg[kv.first] = kv.second;
      int sid = sess->id;
      sessions_[sid] = std::move(sess);
      // bound total retained sessions: evict oldest detached ones first
      // (hserver keeps session logs for the UI, but not without limit)
      if (sessions_.size() > 100) {
        for (auto it = sessions_.begin();
             it != sessions_.end() && sessions_.size() > 100;) {
          if (it->second->left && it->first != sid)
            it = sessions_.erase(it);
          else
            ++it;
        }
      }
      return "{\"status\": \"OK\", \"session\": " + std::to_string(sid) + "}";
    }
    double sid_d = 0;
    json_get_number(msg, "session", &sid_d);
    // shared_ptr keeps the session alive across a concurrent eviction
    std::shared_ptr<Session> sess = find((int)sid_d);
    if (!sess)
      return R"({"status": "FAIL", "error": "no such session"})";
    std::lock_guard<std::mutex> lk(sess->mu);
    if (op == "fetch") {
      // "reason" distinguishes a temporary operator pause (client
      // retries) from strategy exhaustion (final) — Python-server parity
      auto paused = sess->cfg.find("PAUSED");
      if (paused != sess->cfg.end() && !paused->second.empty() &&
          paused->second != "0")
        return R"({"status": "BUSY", "reason": "paused"})";
      std::vector<int> pt(sess->ndims);
      if (!sess->engine->generate(pt.data())) {
        if (!sess->outstanding.empty() && !sess->engine->converged())
          return R"({"status": "BUSY", "reason": "waiting"})";
        return R"({"status": "BUSY", "reason": "exhausted"})";
      }
      sess->outstanding.insert(pt);
      return "{\"status\": \"OK\", \"point\": " + int_array_json(pt) +
             ", \"values\": " + int_array_json(pt) + "}";
    }
    if (op == "report") {
      std::vector<int> pt;
      double perf = 0;
      if (!json_get_int_array(msg, "point", &pt) ||
          !json_get_number(msg, "perf", &perf) ||
          (int)pt.size() != sess->ndims)
        return R"({"status": "FAIL", "error": "bad report"})";
      // only the FIRST report per issued point drives the engine; stale
      // duplicates (NM hands its current test point to every fetching
      // client) still land in history/best for the UI
      if (sess->outstanding.erase(pt) > 0)
        sess->engine->analyze(pt.data(), perf);
      sess->trials++;
      if (perf < sess->best_perf) sess->best_perf = perf;
      sess->history.emplace_back(
          std::chrono::duration<double>(
              std::chrono::system_clock::now().time_since_epoch()).count(),
          perf);
      // bound per-session history (only the UI reads it)
      if (sess->history.size() > 10000)
        sess->history.erase(sess->history.begin(),
                            sess->history.begin() + 5000);
      return R"({"status": "OK"})";
    }
    if (op == "reject") {
      std::vector<int> pt;
      if (!json_get_int_array(msg, "point", &pt) ||
          (int)pt.size() != sess->ndims)
        return R"({"status": "FAIL", "error": "bad reject"})";
      if (sess->outstanding.erase(pt) > 0)
        sess->engine->rejected(pt.data());
      return R"({"status": "OK"})";
    }
    if (op == "best") {
      std::vector<int> pt(sess->ndims);
      if (!sess->engine->best(pt.data()))
        return R"({"status": "OK", "values": null, "perf": null})";
      return "{\"status\": \"OK\", \"values\": " + int_array_json(pt) +
             ", \"perf\": " + std::to_string(sess->engine->best_perf()) + "}";
    }
    if (op == "converged") {
      return std::string("{\"status\": \"OK\", \"converged\": ") +
             (sess->engine->converged() ? "true" : "false") + "}";
    }
    if (op == "getcfg") {
      std::string key = json_get_string(msg, "key");
      if (key.empty()) return R"({"status": "FAIL", "error": "no key"})";
      std::string val_json = "null";
      if (key == "STRATEGY_CONVERGED") {
        val_json = sess->engine->converged() ? "\"1\"" : "\"0\"";
      } else {
        auto it = sess->cfg.find(key);
        if (it != sess->cfg.end())
          val_json = "\"" + json_escape(it->second) + "\"";
      }
      return "{\"status\": \"OK\", \"key\": \"" + json_escape(key) +
             "\", \"value\": " + val_json + "}";
    }
    if (op == "setcfg") {
      std::string key = json_get_string(msg, "key");
      if (key.empty()) return R"({"status": "FAIL", "error": "no key"})";
      std::string old_json = "null";
      auto it = sess->cfg.find(key);
      if (it != sess->cfg.end())
        old_json = "\"" + json_escape(it->second) + "\"";
      std::string val;
      if (json_get_string_opt(msg, "value", &val))
        sess->cfg[key] = val;           // set / overwrite
      else if (it != sess->cfg.end())
        sess->cfg.erase(it);            // value null/absent: erase
      return "{\"status\": \"OK\", \"key\": \"" + json_escape(key) +
             "\", \"old\": " + old_json + "}";
    }
    if (op == "leave") {
      sess->left = true;  // retained for the UI, evictable under pressure
      return R"({"status": "OK"})";
    }
    return R"({"status": "FAIL", "error": "unknown op"})";
  }

  std::shared_ptr<Session> find(int sid) {
    std::lock_guard<std::mutex> lk(mu_);
    auto it = sessions_.find(sid);
    return it == sessions_.end() ? nullptr : it->second;
  }

  // ---- HTTP monitor ---------------------------------------------------
  void handle_http(int cfd) {
    char req[4096] = {0};
    recv(cfd, req, sizeof(req) - 1, 0);
    std::string path = "/";
    {
      std::string r(req);
      auto sp1 = r.find(' ');
      auto sp2 = r.find(' ', sp1 + 1);
      if (sp1 != std::string::npos && sp2 != std::string::npos)
        path = r.substr(sp1 + 1, sp2 - sp1 - 1);
    }
    std::string body, ctype = "text/html";
    if (path.rfind("/api/session/", 0) == 0) {
      // incremental trial stream: /api/session/<id>?since=N returns
      // history[N:] so the monitor page polls live without reloading
      // (the flot refresh-loop analogue, httpsvr.c:62-77)
      ctype = "application/json";
      std::string tail = path.substr(strlen("/api/session/"));
      size_t q = tail.find('?');
      long since = 0;
      if (q != std::string::npos) {
        auto query = tail.substr(q + 1);
        auto sp = query.find("since=");
        if (sp != std::string::npos) since = atol(query.c_str() + sp + 6);
        tail = tail.substr(0, q);
      }
      if (since < 0) since = 0;
      auto s = find(atoi(tail.c_str()));
      if (!s) {
        const char* nf = "not found";
        std::string h404 = "HTTP/1.0 404 Not Found\r\nContent-Type: "
                           "text/plain\r\nContent-Length: 9\r\n\r\n";
        std::string all404 = h404 + nf;
        send(cfd, all404.data(), all404.size(), MSG_NOSIGNAL);
        return;
      }
      std::lock_guard<std::mutex> lk2(s->mu);
      char num[64];
      body = "{\"id\": " + std::to_string(s->id) + ", \"name\": \"" +
             json_escape(s->name) +
             "\", \"total\": " + std::to_string(s->history.size()) +
             ", \"converged\": " +
             (s->engine->converged() ? "true" : "false") + ", \"cfg\": {";
      {
        bool cfirst = true;   // runtime config (session-view parity)
        for (const auto& kv : s->cfg) {
          if (!cfirst) body += ", ";
          cfirst = false;
          body += "\"" + json_escape(kv.first) + "\": \"" +
                  json_escape(kv.second) + "\"";
        }
      }
      body += "}, \"best\": {";
      if (std::isfinite(s->best_perf)) {
        snprintf(num, sizeof(num), "%.17g", s->best_perf);
        body += std::string("\"perf\": ") + num;
      } else {
        body += "\"perf\": null";
      }
      body += "}, \"trials\": [";
      bool first = true;
      for (size_t i = (size_t)std::min<long>(since, s->history.size());
           i < s->history.size(); ++i) {
        if (!first) body += ", ";
        first = false;
        snprintf(num, sizeof(num), "%.6f", s->history[i].first);
        body += std::string("[") + num + ", [], ";
        if (std::isfinite(s->history[i].second)) {
          snprintf(num, sizeof(num), "%.17g", s->history[i].second);
          body += num;
        } else {
          body += "null";
        }
        body += "]";
      }
      body += "]}";
    } else if (path.rfind("/api/sessions", 0) == 0) {
      ctype = "application/json";
      body = "[";
      std::lock_guard<std::mutex> lk(mu_);
      bool first = true;
      for (auto& [sid, s] : sessions_) {
        std::lock_guard<std::mutex> lk2(s->mu);
        if (!first) body += ", ";
        first = false;
        body += "{\"id\": " + std::to_string(sid) + ", \"name\": \"" +
                json_escape(s->name) +
                "\", \"trials\": " + std::to_string(s->trials) +
                ", \"converged\": " +
                (s->engine->converged() ? "true" : "false") + "}";
      }
      body += "]";
    } else if (path.rfind("/session/", 0) == 0) {
      auto s = find(atoi(path.c_str() + strlen("/session/")));
      if (!s) {
        std::string h404 = "HTTP/1.0 404 Not Found\r\nContent-Type: "
                           "text/plain\r\nContent-Length: 9\r\n\r\nnot found";
        send(cfd, h404.data(), h404.size(), MSG_NOSIGNAL);
        return;
      }
      long sid2;
      {
        std::lock_guard<std::mutex> lk2(s->mu);
        sid2 = s->id;
        body = "<html><body><h2>" + html_escape(s->name) + "</h2>"
               "<p id='best'>best: " + std::to_string(s->best_perf) +
               "</p><svg width=600 height=200 style='border:1px solid "
               "#ccc'><polyline id='chart' fill='none' stroke='#36c' "
               "points=''/></svg><table border=1><tr><th>time</th>"
               "<th>perf</th></tr><tbody id='hist'></tbody></table>";
      }
      // live polling of /api/session/<id>?since=N (textContent-only DOM
      // writes; starts from 0 so the full history renders client-side)
      body += "<script>\n"
              "var SID=" + std::to_string(sid2) + ", seen=0, data=[];\n"
              "function redraw(){var ps=data.filter(function(p){return "
              "p!=null;}); if(!ps.length) return; var lo=Math.min.apply("
              "null,ps), hi=Math.max.apply(null,ps), span=(hi-lo)||1, "
              "pts=[];\n"
              "for(var i=0;i<data.length;i++){ if(data[i]==null) continue;"
              " pts.push((i/Math.max(data.length-1,1)*560+20).toFixed(1)+"
              "','+(180-(data[i]-lo)/span*160).toFixed(1)); }\n"
              "document.getElementById('chart').setAttribute('points', "
              "pts.join(' '));}\n"
              "function tick(){ fetch('/api/session/'+SID+'?since='+seen)"
              ".then(function(r){return r.json();}).then(function(j){\n"
              "if(j.trials.length){ var tb=document.getElementById('hist');"
              " j.trials.forEach(function(tr){ var row=document."
              "createElement('tr');\n"
              "[new Date(tr[0]*1000).toLocaleTimeString(), tr[2]==null?"
              "'inf':tr[2].toPrecision(6)].forEach(function(v){var td="
              "document.createElement('td'); td.textContent=v; "
              "row.appendChild(td);}); tb.appendChild(row); "
              "data.push(tr[2]); });\n"
              "seen=j.total; if(j.best&&j.best.perf!=null) document."
              "getElementById('best').textContent='best: '+j.best.perf;"
              " redraw(); }\n"
              "if(!j.converged) setTimeout(tick, 1000); })"
              ".catch(function(){ setTimeout(tick, 3000); }); }\n"
              "tick();\n</script></body></html>";
    } else {
      body = "<html><head><title>offt-tpu tuning (native)</title></head>"
             "<body><h2>offt-tpu native tuning server</h2>"
             "<table border=1><tr><th>session</th><th>trials</th>"
             "<th>best</th><th>converged</th></tr>";
      std::lock_guard<std::mutex> lk(mu_);
      for (auto& [sid, s] : sessions_) {
        std::lock_guard<std::mutex> lk2(s->mu);
        body += "<tr><td><a href='/session/" + std::to_string(sid) + "'>" +
                html_escape(s->name) + "</a></td><td>" +
                std::to_string(s->trials) + "</td><td>" +
                std::to_string(s->best_perf) + "</td><td>" +
                (s->engine->converged() ? "yes" : "no") + "</td></tr>";
      }
      body += "</table></body></html>";
    }
    std::string hdr = "HTTP/1.0 200 OK\r\nContent-Type: " + ctype +
                      "\r\nContent-Length: " + std::to_string(body.size()) +
                      "\r\n\r\n";
    std::string all = hdr + body;
    send(cfd, all.data(), all.size(), MSG_NOSIGNAL);
  }

  int fd_;
  int port_;
  std::mutex mu_;
  std::map<int, std::shared_ptr<Session>> sessions_;
  int next_id_ = 1;
};

}  // namespace

int main(int argc, char** argv) {
  const char* host = "127.0.0.1";
  int port = 1979;  // the reference's default (defaults.h:24)
  for (int i = 1; i < argc - 1; ++i) {
    if (!strcmp(argv[i], "--port")) port = atoi(argv[i + 1]);
    if (!strcmp(argv[i], "--host")) host = argv[i + 1];
  }
  Server srv(host, port);
  printf("offt-tpu native tuning server on %s:%d\n", host, srv.port());
  fflush(stdout);
  srv.serve();
  return 0;
}
