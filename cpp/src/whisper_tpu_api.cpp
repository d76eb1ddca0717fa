// C ABI implementation: native audio frontend + minimal HTTP/1.1 client
// (raw sockets, no deps — replaces the reference's vendored 13k-line httplib
// on the client side) against the whisper-tpu serving endpoint.

#include "whisper_tpu_api.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "audio_io.h"

namespace {

thread_local std::string g_api_error;

struct Client {
  std::string host;
  int port = 0;
  std::string language = "zh";
  std::string task = "transcribe";
  int timeout_ms = 300000;
};

int connect_to(const std::string& host, int port, int timeout_ms) {
  struct addrinfo hints = {};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  struct addrinfo* res = nullptr;
  const std::string port_s = std::to_string(port);
  if (getaddrinfo(host.c_str(), port_s.c_str(), &hints, &res) != 0) {
    g_api_error = "getaddrinfo failed for " + host;
    return -1;
  }
  int fd = -1;
  for (auto* p = res; p; p = p->ai_next) {
    fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
    if (fd < 0) continue;
    struct timeval tv = {timeout_ms / 1000, (timeout_ms % 1000) * 1000};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
    if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd < 0) g_api_error = "connect failed to " + host + ":" + port_s;
  return fd;
}

bool send_all(int fd, const char* buf, size_t len) {
  size_t off = 0;
  while (off < len) {
    ssize_t w = send(fd, buf + off, len - off, 0);
    if (w <= 0) return false;
    off += static_cast<size_t>(w);
  }
  return true;
}

// Issue one HTTP/1.1 request, return body (handles Content-Length framing).
int http_request(const Client& c, const std::string& method,
                 const std::string& path, const std::string& content_type,
                 const std::string& extra_headers, const std::string& body,
                 std::string* resp_body, int* status) {
  int fd = connect_to(c.host, c.port, c.timeout_ms);
  if (fd < 0) return -1;

  std::string req = method + " " + path + " HTTP/1.1\r\n";
  req += "Host: " + c.host + "\r\n";
  req += "Connection: close\r\n";
  if (!content_type.empty()) req += "Content-Type: " + content_type + "\r\n";
  req += extra_headers;
  req += "Content-Length: " + std::to_string(body.size()) + "\r\n\r\n";

  bool ok = send_all(fd, req.data(), req.size()) &&
            (body.empty() || send_all(fd, body.data(), body.size()));
  if (!ok) {
    g_api_error = "send failed";
    close(fd);
    return -1;
  }
  std::string raw;
  char buf[8192];
  ssize_t r;
  while ((r = recv(fd, buf, sizeof(buf), 0)) > 0) raw.append(buf, static_cast<size_t>(r));
  close(fd);
  const size_t hdr_end = raw.find("\r\n\r\n");
  if (hdr_end == std::string::npos) {
    g_api_error = "malformed HTTP response";
    return -1;
  }
  *status = 0;
  std::sscanf(raw.c_str(), "HTTP/%*s %d", status);
  *resp_body = raw.substr(hdr_end + 4);
  return 0;
}

// Tiny JSON string-field extractor: {"text": "..."} with escape handling.
bool json_get_string(const std::string& js, const std::string& key, std::string* out) {
  const std::string pat = "\"" + key + "\"";
  size_t k = js.find(pat);
  if (k == std::string::npos) return false;
  size_t colon = js.find(':', k + pat.size());
  if (colon == std::string::npos) return false;
  size_t q = js.find('"', colon);
  if (q == std::string::npos) return false;
  std::string res;
  for (size_t i = q + 1; i < js.size(); ++i) {
    char ch = js[i];
    if (ch == '\\' && i + 1 < js.size()) {
      char n = js[++i];
      switch (n) {
        case 'n': res += '\n'; break;
        case 't': res += '\t'; break;
        case 'r': res += '\r'; break;
        case 'u': {
          if (i + 4 < js.size()) {
            unsigned cp = std::strtoul(js.substr(i + 1, 4).c_str(), nullptr, 16);
            i += 4;
            // UTF-8 encode the BMP codepoint
            if (cp < 0x80) {
              res += static_cast<char>(cp);
            } else if (cp < 0x800) {
              res += static_cast<char>(0xC0 | (cp >> 6));
              res += static_cast<char>(0x80 | (cp & 0x3F));
            } else {
              res += static_cast<char>(0xE0 | (cp >> 12));
              res += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
              res += static_cast<char>(0x80 | (cp & 0x3F));
            }
            break;
          }
          return false;
        }
        default: res += n;
      }
    } else if (ch == '"') {
      *out = res;
      return true;
    } else {
      res += ch;
    }
  }
  return false;
}

int run_pcm_impl(Client* c, const float* samples, int64_t n, char** result) {
  std::string body(reinterpret_cast<const char*>(samples),
                   static_cast<size_t>(n) * sizeof(float));
  std::string headers = "X-Language: " + c->language + "\r\nX-Task: " + c->task + "\r\n";
  std::string resp;
  int status = 0;
  if (http_request(*c, "POST", "/asr", "application/octet-stream", headers,
                   body, &resp, &status) != 0) {
    return -1;
  }
  if (status != 200) {
    g_api_error = "server returned " + std::to_string(status) + ": " + resp;
    return -1;
  }
  std::string text;
  if (!json_get_string(resp, "text", &text)) {
    g_api_error = "no text field in response: " + resp;
    return -1;
  }
  *result = static_cast<char*>(std::malloc(text.size() + 1));
  std::memcpy(*result, text.c_str(), text.size() + 1);
  return 0;
}

}  // namespace

extern "C" {

const char* WT_LastError(void) { return g_api_error.c_str(); }

WT_HANDLE WT_Init(const WT_InitAttr* attr) {
  if (!attr || !attr->host) {
    g_api_error = "null init attr";
    return nullptr;
  }
  auto* c = new Client();
  c->host = attr->host;
  c->port = attr->port;
  if (attr->language) c->language = attr->language;
  if (attr->task) c->task = attr->task;
  if (attr->timeout_ms > 0) c->timeout_ms = attr->timeout_ms;

  std::string resp;
  int status = 0;
  if (http_request(*c, "GET", "/health", "", "", "", &resp, &status) != 0 ||
      status != 200) {
    g_api_error = "health check failed: " + g_api_error;
    delete c;
    return nullptr;
  }
  return c;
}

int WT_RunPCM(WT_HANDLE h, const float* samples, int64_t n, char** result) {
  if (!h || !samples || n <= 0 || !result) {
    g_api_error = "bad args";
    return -1;
  }
  return run_pcm_impl(static_cast<Client*>(h), samples, n, result);
}

int WT_RunFile(WT_HANDLE h, const char* wav_path, char** result) {
  if (!h || !wav_path || !result) {
    g_api_error = "bad args";
    return -1;
  }
  FILE* f = std::fopen(wav_path, "rb");
  if (!f) {
    g_api_error = std::string("cannot open ") + wav_path;
    return -1;
  }
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(static_cast<size_t>(sz));
  if (std::fread(data.data(), 1, data.size(), f) != data.size()) {
    std::fclose(f);
    g_api_error = "short read";
    return -1;
  }
  std::fclose(f);

  float* samples = nullptr;
  int64_t n = 0;
  int rate = 0;
  if (wt_load_wav(data.data(), data.size(), 16000, &samples, &n, &rate) != 0) {
    g_api_error = wt_last_error();
    return -1;
  }
  int rc = run_pcm_impl(static_cast<Client*>(h), samples, n, result);
  wt_free(samples);
  return rc;
}

void WT_FreeResult(char* result) { std::free(result); }

void WT_Uninit(WT_HANDLE h) { delete static_cast<Client*>(h); }

}  // extern "C"
